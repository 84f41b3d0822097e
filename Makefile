# Convenience targets. TPU work MUST run one process at a time (see CLAUDE.md).

.PHONY: test bench multichip smoke clean

test:
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
