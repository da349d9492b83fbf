.PHONY: test bench dist clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dist:
	mkdir -p dist
	cd . && zip -qr dist/geo_index_spark.zip geo_index_spark -x "*.pyc" -x "*__pycache__*"

clean:
	rm -rf dist .pytest_cache
