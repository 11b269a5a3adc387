# Developer targets (counterpart of reference Makefile)

PYTHON ?= python

.PHONY: install test test-slow bench style linter count gifs gallery

install:
	pip install -e . --no-deps --no-build-isolation

test:
	$(PYTHON) -m pytest tests/ -x -q -m "not slow"

test-slow:
	$(PYTHON) -m pytest tests/ -q -m slow

bench:
	$(PYTHON) bench.py

bench-smoke:
	$(PYTHON) bench.py --smoke

style:
	-isort gymca_tpu tests scripts/run scripts/update_gallery scripts/versionate
	-black gymca_tpu tests scripts/run scripts/update_gallery scripts/versionate

linter:
	-$(PYTHON) -m mypy gymca_tpu --ignore-missing-imports
	@grep -rn "print(" gymca_tpu --include="*.py" | grep -v "#.*print" || true

count:
	@wc -l $$(find gymca_tpu tests -name "*.py") | tail -1

gallery:
	$(PYTHON) scripts/update_gallery

patch:
	$(PYTHON) scripts/versionate --patch
