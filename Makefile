# Convenience targets (the reference ships shell wrappers around its
# CMake build; here the Python package needs no build step).

.PHONY: test bench validate native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

validate:  ## on-chip differential campaign, all 24 profiles
	python tools/validate_hw.py

native:  ## optional C++ fast loader
	$(MAKE) -C native

clean:
	rm -rf native/build .jax_cache
