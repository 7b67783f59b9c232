# Developer entry points (parity with the reference's Makefile targets:
# /root/reference/Makefile help/lint/test/package — adapted to this build's
# tooling; no pip installs, everything runs against the baked-in env).

.PHONY: help test test-fast lint bench dryrun package

help:           ## list targets
	@grep -E '^[a-z-]+:.*##' Makefile | awk -F':.*## ' '{printf "  %-12s %s\n", $$1, $$2}'

test:           ## full suite on the 8-virtual-device CPU mesh
	python -m pytest tests/ -q

test-fast:      ## skip the slowest files (multiprocess, streaming, sharded)
	python -m pytest tests/ -q --ignore=tests/test_multiprocess.py \
	  --ignore=tests/test_streaming.py --ignore=tests/test_sharded.py

lint:           ## byte-compile + import hygiene (no flake8 in this env)
	python -m compileall -q node2vec_tpu tests examples
	python -m pytest tests/test_import_hygiene.py -q

bench:          ## one-chip TPU benchmark (one JSON line on stdout)
	python bench.py

dryrun:         ## multi-chip sharding dry-run on 8 virtual CPU devices
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'; \
	import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

package:        ## build an sdist/wheel
	python -m pip wheel --no-deps --no-build-isolation -w dist .
