#!/bin/sh
# Semantic-segmentation finetune on S3DIS (Area-5 holdout) - the entry the
# reference implies but never shipped
python -m vipformer_tpu.cli.ft_semseg \
    --proj_name Model_mp_ft --exp_name SemSeg-H6D384 \
    --batch_size 32 --test_batch_size 32 --epochs 100 \
    --point_channels 6 --num_obj_classes 13 --test_area 5 \
    --num_latent_channels 384 --num_ca_heads 6 --num_sa_heads 6 \
    --num_sa_layers 12 --mlp_widen_factor 4 --layer_idx 2 6 10 \
    --num_pc_latents 128 --group_size 32 --num_ft_points 4096 \
    --optim adamw --lr 0.001 --scheduler cos \
    --max_dpr 0.1 --atten_drop 0.0 --mlp_drop 0.0 "$@"
