.PHONY: test test-fast bench demo-data train-demo evaluate-demo native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x --ignore=tests/test_end_to_end.py \
		--ignore=tests/test_stylegan3_parity.py

bench:
	python bench.py

demo-data:
	python -c "from afcm_tpu.data.demo import write_demo_tree; write_demo_tree('data/demo')"

train-demo: demo-data
	python -m afcm_tpu.train --config-file configs/demo/cmsr_tiny.yml

evaluate-demo:
	python -m afcm_tpu.evaluate --config-file configs/demo/cmsr_tiny.yml

native:
	python -c "from afcm_tpu.native import have_native; assert have_native(); print('native ops built')"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; \
	rm -f afcm_tpu/native/_window_ops.so
