# Developer entry points (parity surface: reference Makefile).

.PHONY: test test-full test-tpu bench dryrun-multichip verify-real-weights clean

test:  ## fast suite (CPU, virtual 8-device mesh)
	python -m pytest tests/ -q

test-full:  ## include slow tests
	python -m pytest tests/ -q --run-slow

test-tpu:  ## run the suite against real TPU hardware
	LMMS_OWC_TEST_TPU=1 python -m pytest tests/ -q

bench:  ## end-to-end throughput benchmark on the default accelerator
	python bench.py

dryrun-multichip:  ## validate the sharded multi-chip path on virtual CPU devices
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py multichip 8

verify-real-weights:  ## diff the limit=8 matrix vs BASELINE.md pins (needs CHECKPOINT_ROOT)
	python scripts/verify_real_weights.py --checkpoint_root $(CHECKPOINT_ROOT) --scoring

clean:
	find . -type d -name __pycache__ -exec rm -rf {} +
	rm -rf .pytest_cache lmms_owc_tpu/.cache
