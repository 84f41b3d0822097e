# Convenience targets. TPU work MUST run one process at a time (see CLAUDE.md).

.PHONY: test test-all bench multichip smoke clean

# fast tier: inner-loop verification in minutes (slow tier has the
# quality-regression / pipeline-parallel / training scans / bench smoke)
test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	JAX_COMPILATION_CACHE_DIR=$(PWD)/.jax_cache python bench.py

multichip:
	env -u PYTHONPATH JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python __graft_entry__.py multichip 8

perf:
	JAX_COMPILATION_CACHE_DIR=$(PWD)/.jax_cache python scripts/perf_probe.py

clean:
	rm -rf loggings .pytest_cache rule_guided_music_tpu/native/_build
	find . -name __pycache__ -type d -exec rm -rf {} +
