#!/bin/bash
# End-of-round serialized verification chain (r11; previously reconstructed
# per-round in /tmp). Run on an OTHERWISE IDLE machine — several steps carry
# timing asserts. Takes 60-90 min: launch detached and poll the log, e.g.
#   setsid nohup bash tools/run_chain.sh > /tmp/chain.log 2>&1 & disown
#
# Order matters: scale_probe main() OVERWRITES SCALING.md; --sf1/--sf10 and
# demux_probe APPEND. If any code lands after this chain, re-run the
# affected steps so CHECK_LOCAL quotes frozen-HEAD numbers only.
set -e
cd "$(dirname "$0")/.."
# 24g for EVERYTHING: the 8g default GC-thrashes on demux's wide1e7 tier
# and broadcast-OOMs on minhash_calibration@sf10 (r9 and r11 both hit this
# by scoping the export too narrowly).
export SPARK_GRAFT_DRIVER_MEM=24g
echo "=== chain HEAD: $(git rev-parse HEAD) ==="
echo "=== [1/10] plan_audit ==="
python tools/plan_audit.py
echo "=== [2/10] scale_probe (sf0.001-0.1; overwrites SCALING.md) ==="
python tools/scale_probe.py
echo "=== [3/10] scale_probe --sf1 ==="
python tools/scale_probe.py --sf1
echo "=== [4/10] scale_probe --sf10 (decade probe) ==="
python tools/scale_probe.py --sf10
echo "=== [5/10] demux_probe ==="
python tools/demux_probe.py
echo "=== [6/10] window_warning_audit ==="
python tools/window_warning_audit.py
echo "=== [7/10] check_oracle sf0.01 ==="
python tools/check_oracle.py /root/testdata/sf0.01
echo "=== [8/10] check_oracle sf0.1 ==="
python tools/check_oracle.py /root/testdata/sf0.1
echo "=== [9/10] bench ==="
python bench.py
echo "=== [10/10] tail_tenure ==="
python tools/tail_tenure.py
echo "=== chain complete at $(git rev-parse HEAD) ==="
echo "Now re-run pytest + the vanilla driver simulation at this HEAD"
echo "(see .claude/skills/verify/SKILL.md) before writing CHECK_LOCAL."
