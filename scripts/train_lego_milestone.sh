#!/bin/bash
# PSNR milestone ladder: train lego in snapshot-checkpointed chunks
# (each chunk a fresh process — the remote TPU worker is recycled under
# sustained load), then evaluate held-out PSNR.
set -u
cd "$(dirname "$0")/.."
SNAP=${SNAP:-/tmp/lego_milestone.sng}
CHUNK=${CHUNK:-384}
CHUNKS=${CHUNKS:-8}
DOWNSCALE=${DOWNSCALE:-2}

for i in $(seq 1 "$CHUNKS"); do
    LOAD=""
    [ -f "$SNAP" ] && LOAD="--load-snapshot $SNAP"
    echo "=== chunk $i/$CHUNKS"
    timeout 1500 python -m synerfgine_tpu.cli.main train \
        --scene /root/reference/data/nerf/lego --downscale "$DOWNSCALE" \
        --n-steps "$CHUNK" --save-snapshot "$SNAP" --snapshot-optimizer \
        $LOAD --test-every 8 || echo "chunk $i failed (continuing)"
    sleep 10
done

echo "=== eval"
timeout 1500 python -m synerfgine_tpu.cli.main eval \
    --scene /root/reference/data/nerf/lego --downscale "$DOWNSCALE" \
    --load-snapshot "$SNAP" --n-views 4 --out /tmp/lego_milestone_renders
