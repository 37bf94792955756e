#!/bin/bash
# End-to-end CLI dress rehearsal ON THE REAL TPU (VERDICT r3 item 8 /
# r4 item 5): synth volumes -> train-bscan (v8) -> predict-bscan
# overlays -> inspect HTML, wall-clocked, artifacts + log committed under
# docs/runs/. This is the reference's script-per-step workflow
# (SURVEY.md §1 L5) driven through the pautdx CLI off the test mesh.
set -euo pipefail
cd "$(dirname "$0")/.." || exit 1
RUN=docs/runs/r5_dress
RAW=/tmp/dress_raw
mkdir -p "$RUN" "$RAW"
exec > >(tee "$RUN/run.log") 2>&1

echo "== dress rehearsal $(date -u +%FT%TZ) =="
python - <<'EOF'
import os
from pautdx.data import synthetic
os.makedirs("/tmp/dress_raw", exist_ok=True)
for i in range(8):
    spec = synthetic.VolumeSpec(n_beams=6, n_scans=96, n_samples=320,
                                noise=0.05, seed=300 + i)
    synthetic.write_json_volume(f"/tmp/dress_raw/v{i}.json", spec, None)
print("volumes written")
EOF

t0=$(date +%s)
# 24 epochs at lr 2e-3: the first rehearsal (6 epochs, default 1e-3)
# trained to completion but left max detection scores ~1e-4 — on these
# sparse volumes (~25% of frames carry a defect) the confidence head
# needs the longer schedule (a CPU probe shows scores still climbing
# at 15 epochs). Both are stock CLI flags.
echo "-- train-bscan (YOLO v8-n, 320px, 24 epochs) --"
python -m pautdx.cli train-bscan --data "$RAW" --out /tmp/dress_yolo \
    --detector yolo --size 320 --epochs 24 --batch-size 8 --lr 2e-3 \
    --augment
t1=$(date +%s); echo "train wall-clock: $((t1 - t0))s"

echo "-- predict-bscan (overlays) --"
python -m pautdx.cli predict-bscan --data "$RAW" --out /tmp/dress_pred \
    --detector yolo --checkpoint /tmp/dress_yolo --size 320 \
    --num-classes 1 --threshold 0.15 --overlays
t2=$(date +%s); echo "predict wall-clock: $((t2 - t1))s"

echo "-- inspect (HTML QA page) --"
python -m pautdx.cli inspect --data "$RAW" --mode bscan \
    --out "$RUN/inspector.html" --checkpoint /tmp/dress_yolo \
    --detector yolo --size 320 --num-classes 1 --threshold 0.15
t3=$(date +%s); echo "inspect wall-clock: $((t3 - t2))s"

cp /tmp/dress_yolo/history.json "$RUN/train_history.json" 2>/dev/null || true
ls /tmp/dress_pred | head -20 > "$RUN/predictions_ls.txt"
echo "total wall-clock: $((t3 - t0))s"
echo "== done =="
