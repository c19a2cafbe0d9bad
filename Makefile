# knowhere_tpu build/test targets (reference Makefile exposes unified
# build/test/bench targets; same spirit here).

PY ?= python

.PHONY: all native test test-fast bench graft-check lint clean

all: native test

native:
	g++ -O3 -march=native -shared -fPIC -pthread native/knowhere_native.cpp -o native/libknowhere_native.so

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

graft-check:
	$(PY) __graft_entry__.py

clean:
	rm -f native/libknowhere_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
