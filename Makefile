# Developer entry points (the reference's justfile analog —
# reference: justfile:1-33).

.PHONY: test test-fast bench native check lint dryrun clean

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not parity and not parallel"

bench:
	python bench.py

bench-suite:
	python benches/bench_suite.py

dryrun:
	python __graft_entry__.py

check:
	python -m compileall -q clip_embedder_tpu
	python -c "import clip_embedder_tpu"
	python tools/lint.py

lint:
	python tools/lint.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
