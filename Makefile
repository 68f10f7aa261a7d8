.PHONY: test native bench smoke clean

test: native
	python -m pytest tests/ -q

native:
	$(MAKE) -C native -s

bench: native
	python bench.py

# offline smoke: tiny checkpoint end-to-end (the reference's opt-125m
# quick path, ref README.md:91-94, rebuilt for zero-egress environments)
smoke: native
	python -c "from asvd4llm_tpu.utils.testing import build_tiny_checkpoint; \
	  build_tiny_checkpoint('/tmp/asvd_smoke_ckpt', 'llama')"
	HF_HUB_OFFLINE=1 python -m asvd4llm_tpu.cli \
	  --model_id /tmp/asvd_smoke_ckpt --calib_dataset synthetic \
	  --eval_ppl synthetic --param_ratio_target 0.9 --act_aware \
	  --n_calib_samples 4 --seqlen 128 --eval_dtype float32

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d | xargs rm -rf
