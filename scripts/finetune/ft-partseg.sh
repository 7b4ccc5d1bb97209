#!/bin/sh
# Part-segmentation finetune on ShapeNetPart (reference TABLE III setup)
python -m vipformer_tpu.cli.ft_partseg \
    --proj_name Model_mp_ft --exp_name PartSeg-H6D384 \
    --resume true \
    --pc_model_file runs/Model_mp_pt/Both-E1CL8SL-H6D384-L128-MR4/models/pc_model_best.ckpt \
    --batch_size 96 --test_batch_size 96 --epochs 300 \
    --num_latent_channels 384 --num_ca_heads 6 --num_sa_heads 6 \
    --num_sa_layers 12 --mlp_widen_factor 4 --layer_idx 2 6 10 \
    --num_pc_latents 128 --group_size 32 --num_ft_points 1024 \
    --optim adamw --lr 0.001 --scheduler coswarm --step_size 100 \
    --max_lr 0.001 --min_lr 0.0 --warm_epochs 5 --gamma 0.6 \
    --max_dpr 0.1 --atten_drop 0.0 --mlp_drop 0.0 "$@"
