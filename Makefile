# Developer entry points for shennong-tpu

.PHONY: test bench doc lint clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

doc:
	python doc/gen_docs.py

lint:
	python -m py_compile $$(git ls-files '*.py')

clean:
	find . -name '__pycache__' -type d -exec rm -rf {} +
	rm -f shennong_tpu/native/libshennong_io.so
