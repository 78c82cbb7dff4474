"""Execute every Python code block in ``docs/*.md``.

The analogue of the reference's Documenter doctests
(``/root/reference/.github/workflows/documentation.yml``,
``docs/make.jl:10-23``): documentation examples must actually run.  Blocks
are executed per page, sequentially, in one shared namespace seeded with
the symbols the prose assumes (``U``, ``x0``, ``v0``...), with workload
sizes scaled down so the suite stays CPU-fast (the substitutions only
shrink constants; the code paths are identical).

Blocks that require a real multi-host process group are skipped by marker
(they contain ``pf.parallel.initialize``; that path is exercised for real
by ``tests/test_distributed.py``).
"""

import pathlib
import re

import numpy as np
import pytest

DOCS = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "docs").glob("*.md")
    # api.md is generated (signatures only, no runnable blocks); its sync
    # with the code is asserted by test_api_reference_in_sync below
    if p.name != "api.md"
)

# Shrink doc-scale workloads to test-scale ones (docs keep honest sizes).
_SUBSTITUTIONS = [
    ("10_000_000", "600"),
    ("100_000", "600"),
    ("8192", "16"),
    ("4096", "64"),
    ("500.0", "20.0"),
]

_SKIP_MARKERS = ("pf.parallel.initialize",)


def _blocks(path):
    text = path.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


@pytest.mark.parametrize("path", DOCS, ids=lambda p: p.stem)
def test_docs_code_blocks(path, tmp_path, monkeypatch):
    blocks = _blocks(path)
    if not blocks:
        pytest.skip("no python blocks")
    import matplotlib

    matplotlib.use("Agg", force=True)
    monkeypatch.chdir(tmp_path)  # checkpoint examples write run.npz here

    import jax.numpy as jnp

    import pdmpflux_tpu as pf
    from pdmpflux_tpu.utils import potentials

    B, dim = 16, 10
    ns = {
        "np": np,
        "jnp": jnp,
        "pf": pf,
        "U": potentials.gauss,
        "x0": np.zeros((B, dim)),
        "v0": np.ones((B, dim)),
        "k": 0,
        "total_chains": B,
    }
    ran = 0
    for block in blocks:
        if any(m in block for m in _SKIP_MARKERS):
            continue
        src = block
        for old, new in _SUBSTITUTIONS:
            src = src.replace(old, new)
        exec(compile(src, f"{path.name}:block{ran}", "exec"), ns)
        ran += 1
    assert ran > 0


def test_api_reference_in_sync():
    """``docs/api.md`` is generated from docstrings (``docs/gen_api.py``);
    a drifted page means someone changed a public signature/docstring
    without regenerating — the failure message says how to fix it."""
    import runpy

    root = pathlib.Path(__file__).parent.parent
    mod = runpy.run_path(str(root / "docs" / "gen_api.py"))
    expected = mod["render"]()
    committed = (root / "docs" / "api.md").read_text()
    assert committed == expected, (
        "docs/api.md is stale; regenerate with `python docs/gen_api.py`"
    )
