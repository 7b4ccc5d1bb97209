#!/bin/sh
# Contrastive pretraining, architecture E1CL8SL-H6D384-L128-MR4 — the
# larger released-checkpoint arch (reference README.md:95: ModelNet40
# 93.93). The reference experiment matrix (scripts/pretrain/pt-*.sh)
# never shipped this script; it exists here so the real-data validation
# queue (VALIDATE.md) can reproduce the released numbers end-to-end.
python -m vipformer_tpu.cli.pretrain \
    --proj_name Model_mp_pt --exp_name Both-E1CL8SL-H6D384-L128-MR4 \
    --arch E1CL8SL-H6D384-L128-MR4 --modality both \
    --batch_size 330 --test_batch_size 330 --num_workers 18 --epochs 300 \
    --pt_dataset ModelNet40 \
    --optim adamw --lr 0.001 --scheduler coswarm --step_size 100 \
    --max_lr 0.001 --min_lr 0.0 --warm_epochs 5 --gamma 0.6 \
    --num_pt_points 2048 --num_test_points 1024 --group_size 32 \
    --max_dpr 0.0 --atten_drop 0.1 --mlp_drop 0.5 \
    --img_height 144 --img_width 144 --svm_coff 1.0 --print_freq 100 "$@"
