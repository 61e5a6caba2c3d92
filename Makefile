# Convenience targets
test:
	python -m pytest tests/ -x -q -m "not slow"

test_all:
	python -m pytest tests/ -x -q

bench:
	python bench.py

native:
	$(MAKE) -C native

overfit:
	PYTHONPATH=. python scripts/overfit_sanity.py

profile:
	PYTHONPATH=. python scripts/profile_inference.py

# Real-artifact validation (doc/REAL_DATA.md): drop the released .t7,
# raw Visual Genome, and meteor-1.5.jar into ./artifacts and this runs
# convert -> smoke -> preprocess -> mAP-vs-5.70 in one shot. With no
# artifacts it prints exactly what is missing and where to get it.
real_eval:
	PYTHONPATH=. python scripts/real_eval.py

.PHONY: test bench native overfit profile real_eval
