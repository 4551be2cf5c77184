"""docs/REGISTRY.md must stay in sync with the registry.

A PURE comparison (r7 ADVICE: the former self-healing write raced with
bench.py's startup regeneration under parallel runs and broke read-only
checkouts): when stale, this fails with the regeneration command.
Regeneration paths are ``python tools/gen_registry_md.py`` (run it after
adding/renaming queries or when a new CORRECTNESS_r*.json lands) and
bench.py startup — the single in-repo mutation points.
"""

from __future__ import annotations

import os


def test_registry_index_is_current():
    import tools.gen_registry_md as gen

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "docs", "REGISTRY.md")
    fresh = gen.render()
    try:
        with open(path) as f:
            on_disk = f.read()
    except OSError:
        on_disk = ""
    assert on_disk == fresh, (
        "docs/REGISTRY.md is stale — run `python tools/gen_registry_md.py` "
        "and commit the refreshed file"
    )
