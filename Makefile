.PHONY: test test-tpu bench viz profile clean check-docs

test: check-docs
	python -m pytest tests/ -x -q

# README perf table must match the latest BENCH_r*.json (stale docs were
# flagged by three consecutive round verdicts; this makes it mechanical)
check-docs:
	python tools/check_readme_numbers.py

# hardware-gated validation on the real chip (skipped in the CPU suite):
# flash-train dropout parity, compiled-Mosaic Group2Emb parity, and the
# compiled-kernels-under-shard_map suite (1x1 forced mesh).
# scoped to these files: collecting the whole suite imports every test
# module against the remote backend (~15 min of tunnel round-trips)
test-tpu:
	VIPFORMER_TEST_TPU=1 python -m pytest \
	  tests/test_flash_train.py tests/test_g2e_train.py -q -k on_tpu
	VIPFORMER_TEST_TPU=1 python -m pytest tests/test_shard_tpu.py -q

bench:
	python bench.py

bench-quick:
	python bench.py --quick

viz:
	sh tools/visualization/build_render_balls.sh

profile:
	python tools/profile_forward.py 256 1024

clean:
	rm -rf runs /tmp/vipformer_jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
