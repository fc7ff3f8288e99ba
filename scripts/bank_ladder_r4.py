"""Bank the round-4 headline lego ds1 ladder from /tmp into docs/.

Copies progress.json + a render/gt pair per eval rung into
docs/milestone_lego_r4/ (the /tmp milestone dir does not survive driver
sessions). Idempotent; run after scripts/milestone.py finishes.
"""
from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
SRC = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                   else "/tmp/milestone_r4/lego_ds1")
DST = REPO / "docs" / "milestone_lego_r4"


def main():
    prog = SRC / "progress.json"
    if not prog.exists():
        sys.exit(f"no progress at {prog}")
    DST.mkdir(parents=True, exist_ok=True)
    (DST / "progress.json").write_text(prog.read_text())
    p = json.loads(prog.read_text())
    for rd in sorted(SRC.glob("renders_*")):
        for f in (sorted(rd.glob("render_00[01].png"))
                  + sorted(rd.glob("gt_000.png"))):
            (DST / f"{rd.name}_{f.name}").write_bytes(f.read_bytes())
    rungs = [(e["step"], round(e["psnr_mean"], 2)) for e in p["evals"]]
    print(json.dumps({"banked": str(DST), "rungs": rungs}))


if __name__ == "__main__":
    main()
