"""docs/REGISTRY.md must stay in sync with the registry.

Self-healing (round-6 VERDICT item 4 — the index went stale in two
separate rounds when late registry additions weren't re-indexed): when
the on-disk index is stale, this test REGENERATES it in place and then
fails once with a commit instruction, so the very next run (and the
round-close `git add -A`) picks up the fresh file instead of the staleness
surviving the round. bench.py also regenerates at startup as
belt-and-suspenders, since the driver always runs it before round close.
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
    if on_disk != fresh:
        with open(path, "w") as f:
            f.write(fresh)
    assert on_disk == fresh, (
        "docs/REGISTRY.md was stale — it has been REGENERATED in place; "
        "commit the refreshed file (this test passes on the next run)"
    )
