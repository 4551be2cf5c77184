"""docs/REGISTRY.md must stay in sync with the registry — regenerate and
diff (run `python tools/gen_registry_md.py` after adding queries)."""

from __future__ import annotations

import os


def test_registry_index_is_current():
    import tools.gen_registry_md as gen

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if "tests" in os.path.dirname(os.path.abspath(__file__))
        else os.getcwd(),
        "docs",
        "REGISTRY.md",
    )
    with open(path) as f:
        on_disk = f.read()
    assert on_disk == gen.render(), (
        "docs/REGISTRY.md is stale — run `python tools/gen_registry_md.py`"
    )
