#!/bin/sh
# Classification finetune from the E1CL8SL-H6D384-L128-MR4 pretrain
# checkpoint — the arch behind the reference's best ModelNet40 number
# (README.md:95: 93.93 OA; BASELINE.md released-checkpoint table).
python -m vipformer_tpu.cli.ft_cls \
    --proj_name Model_mp_ft --exp_name FT-E1CL8SL-H6D384-L128-MR4 \
    --arch E1CL8SL-H6D384-L128-MR4 --resume true \
    --pc_model_file runs/Model_mp_pt/Both-E1CL8SL-H6D384-L128-MR4/models/pc_model_best.ckpt \
    --batch_size 330 --test_batch_size 330 --epochs 300 \
    --ft_dataset ModelNet40 --num_obj_classes 40 \
    --optim adamw --lr 0.001 --scheduler coswarm --step_size 100 \
    --max_lr 0.001 --min_lr 0.0 --warm_epochs 5 --gamma 0.6 \
    --num_ft_points 1024 --group_size 32 \
    --max_dpr 0.0 --atten_drop 0.1 --mlp_drop 0.5 "$@"
