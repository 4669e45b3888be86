# Top-level convenience targets.

.PHONY: native test bench clean

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
