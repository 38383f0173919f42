# cdfo_tpu — common entry points
.PHONY: test test-fast bench fps serve dryrun native flops train-smoke eval-smoke

test:              ## full suite on the virtual 8-device CPU mesh
	python -m pytest tests/ -q

test-fast:         ## ops + model smoke only
	python -m pytest tests/test_ops_torch_parity.py tests/test_model_smoke.py -q

bench:             ## headline 1080p x4 streaming fps (real chip)
	python bench.py

fps:               ## 3-geometry FPS harness (test_LD_22_FPS protocol)
	python tools/bench_fps.py

serve:             ## sharded streaming-serving demo (all devices)
	python tools/serve.py

dryrun:            ## multi-chip training-step dry run on a virtual mesh
	python __graft_entry__.py

native:            ## build the C++ data-loader components
	sh tools/build_native.sh

flops:             ## params + forward GFLOPs of the flagship
	python tools/flops.py --cpu

train-smoke:       ## 2-epoch synthetic end-to-end training run
	python tools/train.py --synthetic --cpu --epochs 2 --ckpt-dir /tmp/cdfo_train_smoke

eval-smoke:        ## synthetic end-to-end eval run
	python tools/test_sr.py --synthetic --cpu --fps --save-dir /tmp/cdfo_eval_smoke
