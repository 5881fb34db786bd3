# Common tasks. PYTHONPATH must keep /root/.axon_site (TPU plugin).
export PYTHONPATH := $(CURDIR):/root/.axon_site

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py

dryrun:
	python __graft_entry__.py

libmr:
	$(MAKE) -C native/libmr

configs:
	python configs/generate.py

.PHONY: test test-all bench dryrun libmr configs
