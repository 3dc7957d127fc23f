"""Execute the README's python code blocks (the reference ran its README
example via pytest --codeblocks — reference: tox.ini:13, README.md:203-208).
"""

import os
import re

import pytest

README = os.path.join(os.path.dirname(__file__), os.pardir, "README.md")


def _python_blocks():
    with open(README) as f:
        text = f.read()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


@pytest.mark.parametrize("i", range(len(_python_blocks())))
def test_readme_block_runs(i):
    block = _python_blocks()[i]
    ns = {}
    exec(compile(block, f"README.md[block {i}]", "exec"), ns)
