# One-command CI entry — parity with the reference's Travis build+ctest
# matrix (/root/reference/.travis.yml:14-31,95-99).  `make check` reproduces
# the green state: native build, full pytest suite (8-device virtual CPU
# mesh), the multi-chip dry-run the driver validates, example smoke runs,
# and a quick benchmark smoke.

PY ?= python
CPU_ENV = JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: check test native dryrun examples bench-quick tpu-test docs clean

check: docs native test dryrun examples bench-quick
	@echo "ALL CHECKS PASSED"

# Every artifact-cited number in the docs must match the committed JSON it
# cites (stale doc figures recurred three rounds running; now mechanical).
docs:
	$(PY) tools/check_doc_numbers.py

native:
	$(MAKE) -C native

test:
	$(CPU_ENV) $(PY) -m pytest tests/ -q

# NB: `jax.config.update` after import — on hosts whose sitecustomize
# pre-imports jax with a remote TPU backend, the env var alone is too late.
dryrun:
	$(CPU_ENV) $(PY) -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; g.dryrun_multichip(8)"

examples:
	$(CPU_ENV) $(PY) examples/quickstart.py --quick
	$(CPU_ENV) $(PY) examples/thesis_hmm_comparison.py --quick
	$(CPU_ENV) $(PY) examples/calo_variance.py -n 4
	$(CPU_ENV) $(PY) examples/sherpa_gen.py -n 2 --out /tmp/sherpa_smoke
	$(CPU_ENV) $(PY) examples/sherpa_fullscale.py --quick
	$(CPU_ENV) $(PY) examples/external_simulator.py --traces 300 \
	    --particles 64 --out /tmp/external_smoke.json
	$(CPU_ENV) $(PY) examples/posterior_parse_bench.py --particles 16384 \
	    --out /tmp/parse_smoke.json

bench-quick:
	$(PY) bench.py --quick

# Hardware-only subset on the real attached TPU (the tpu_only Pallas PRNG
# tests + on-chip statistical/guided-CSIS tests); records TPU_TEST_r04.json.
tpu-test:
	$(PY) examples/run_tpu_tests.py

clean:
	$(MAKE) -C native clean || true
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
