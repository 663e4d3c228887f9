"""Documentation code blocks must at least parse — the analog of the
reference's doctested README usage (reference: src/lib.rs:22-119, whose doc
examples compile under cargo test)."""

import ast
import re
from pathlib import Path

import pytest

DOCS = [Path("README.md"), Path("docs/DEPLOYMENT.md")]


@pytest.mark.parametrize("doc", DOCS, ids=[str(d) for d in DOCS])
def test_python_blocks_parse(doc):
    text = (Path(__file__).parent.parent / doc).read_text(encoding="utf-8")
    blocks = re.findall(r"```python\n(.*?)```", text, flags=re.S)
    assert blocks, f"no python blocks found in {doc}"
    for i, block in enumerate(blocks):
        try:
            ast.parse(block)
        except SyntaxError as e:
            raise AssertionError(f"{doc} block {i} does not parse: {e}") from e
