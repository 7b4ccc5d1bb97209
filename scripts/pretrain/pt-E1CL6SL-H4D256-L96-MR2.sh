#!/bin/sh
# Contrastive pretraining, architecture E1CL6SL-H4D256-L96-MR2
# (mirrors the reference experiment matrix, scripts/pretrain/pt-*.sh)
python -m vipformer_tpu.cli.pretrain \
    --proj_name Model_mp_pt --exp_name Both-E1CL6SL-H4D256-L96-MR2 \
    --arch E1CL6SL-H4D256-L96-MR2 --modality both \
    --batch_size 330 --test_batch_size 330 --num_workers 18 --epochs 300 \
    --pt_dataset ModelNet40 \
    --optim adamw --lr 0.001 --scheduler coswarm --step_size 100 \
    --max_lr 0.001 --min_lr 0.0 --warm_epochs 5 --gamma 0.6 \
    --num_pt_points 2048 --num_test_points 1024 --group_size 32 \
    --max_dpr 0.0 --atten_drop 0.1 --mlp_drop 0.5 \
    --img_height 144 --img_width 144 --svm_coff 1.0 --print_freq 100 "$@"
