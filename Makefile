# Developer entry points (counterpart of the reference Makefile quality
# gates: format/lint/test — adapted to the tools in this image).

PY ?= python

.PHONY: test test-fast test-smoke lint check-format native bench clean hooks

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -k "not e2e"

# Commit-gate subset (~3 min on one CPU): core math, init-scheme,
# io/checkpoint, merge exactness, padded-class masking, the linter's own
# tests, AND one fwd+bwd parametrization of every Pallas kernel
# (test_kernel_smoke — a broken kernel VJP now fails the gate, not just
# CI).  The full suite (~45 min single-process on this host: megakernel
# parity, multihost, CLI e2e) runs in CI as five split jobs; `make test`
# runs it in one process (conftest clears JAX caches per module to keep
# the long-lived XLA CPU client stable); `pytest -m 'not slow'` skips the
# four >5-min files for a faster local pass.
test-smoke:
	$(PY) -m pytest tests/test_cp_math.py tests/test_init_stats.py \
		tests/test_io.py tests/test_merge.py tests/test_lint.py \
		tests/test_pad_classes.py tests/test_kernel_smoke.py -x -q

lint:
	$(PY) -m compileall -q cara_tpu tests benchmarks tools bench.py __graft_entry__.py
	$(PY) tools/lint.py
	$(PY) tools/format_check.py

# Reference counterpart of `make check-format` (black/isort are not in
# this image; tools/format_check.py enforces the mechanical invariants
# the codebase holds and the isort section contract).
check-format:
	$(PY) tools/format_check.py

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread csrc/dataloader.cc \
		-o csrc/libcara_loader.so -ljpeg -lpng

bench:
	$(PY) bench.py

clean:
	rm -rf csrc/*.so **/__pycache__ .pytest_cache

# Install the commit-time quality gate (reference counterpart:
# .pre-commit-config.yaml — the image has no pre-commit package, so the
# hook is a plain shell script running lint + the fast test subset).
hooks:
	install -m 755 tools/hooks/pre-commit .git/hooks/pre-commit
	@echo "pre-commit hook installed (bypass with git commit --no-verify)"
