# Convenience targets
test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

overfit:
	PYTHONPATH=. python scripts/overfit_sanity.py

profile:
	PYTHONPATH=. python scripts/profile_inference.py

.PHONY: test bench native overfit profile
