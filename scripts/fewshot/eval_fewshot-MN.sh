#!/bin/sh
# Few-shot episodic eval on ModelNet40: 5w10s, 5w20s, 10w10s, 10w20s
for KW in 5 10; do for NS in 10 20; do
python -m vipformer_tpu.cli.eval_fewshot \
    --proj_name Model_mp_pt --exp_name Both-E1CL8SL-H4D256-L128-MR2 \
    --arch E1CL8SL-H4D256-L128-MR2 --ft_dataset ModelNet40 \
    --n_runs 10 --k_way $KW --n_shot $NS --n_query 20 "$@"
done; done
