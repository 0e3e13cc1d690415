# Convenience targets (the reference ships shell wrappers around its
# CMake build; here the Python package needs no build step).

.PHONY: test test-all bench validate native clean

test:  ## fast default gate (skips `slow`-marked tests; < ~5 min)
	python -m pytest tests/ -q -m "not slow"

test-all:  ## the full suite, slow interpret-mode kernels included (parallel)
	python -m pytest tests/ -q -n auto

bench:
	python bench.py

validate:  ## on-chip differential campaign, all 24 profiles
	python tools/validate_hw.py

native:  ## optional C++ fast loader
	$(MAKE) -C native

clean:
	rm -rf native/build .jax_cache
