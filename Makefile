# Developer entry points (counterpart of the reference Makefile quality
# gates: format/lint/test — adapted to the tools in this image).

PY ?= python

.PHONY: test test-fast lint native bench clean

test:
	$(PY) -m pytest tests/ -x -q

test-fast:
	$(PY) -m pytest tests/ -x -q -k "not e2e"

lint:
	$(PY) -m compileall -q cara_tpu tests benchmarks tools bench.py __graft_entry__.py
	$(PY) tools/lint.py

native:
	g++ -O3 -shared -fPIC -std=c++17 -pthread csrc/dataloader.cc \
		-o csrc/libcara_loader.so -ljpeg -lpng

bench:
	$(PY) bench.py

clean:
	rm -rf csrc/*.so **/__pycache__ .pytest_cache
