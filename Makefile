# Common tasks. PYTHONPATH must keep /root/.axon_site (TPU plugin).
export PYTHONPATH := $(CURDIR):/root/.axon_site

test:
	python -m pytest tests/ -q -m "not slow"

# per-round CI tier: fast tests + the strongest end-to-end checks
# (full bdnet forward parity, composed-pipeline parity, sharded-train
# equivalence, shared-backbone feature alignment, 3-step whole-train
# torch parity across the MIB epoch gate — THUMOS and ANet trainers)
ci:
	python -m pytest tests/ -q -m "not slow"
	python -m pytest tests/test_bdnet_parity.py \
	    tests/test_composed_parity.py tests/test_mesh_train.py \
	    tests/test_shared_backbone.py -q
	python -m pytest tests/test_train_kstep_parity.py \
	    tests/test_anet_train_kstep_parity.py -q

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

.PHONY: test ci test-all bench dryrun libmr configs
