#!/bin/sh
# Scale-training proof (round 5): the FlyingChairs-recipe stand-in end to end
# on the real TPU through the production pipeline — 2048 DISTINCT procedural
# samples (tools/synth_dataset), cli/train.py --device-cache
# --steps-per-dispatch (HBM slab cache + K-step dispatch), thousands of
# iterations, held-out EPE at every snapshot. Stand-in for the reference
# recipe README.md:100-106 (FlyingChairs download is network-blocked).
#
# Artifacts land here: log_train.txt (training log), epe_curve.json
# (held-out EPE at init + each snapshot), log_eval_*.txt. Weights/snapshots
# stay OUT of git (snapshots/ is ignored).
set -e
cd "$(dirname "$0")/../.."
OUT=runs/synth
DATA=${SYNTH_PREFIX:-/tmp/synth5}

[ -f ${DATA}_train.flowrec ] || python -m flownet2_tpu.tools.synth_dataset \
    --n 2048 --n-eval 64 --out ${DATA} --seed 11

python -u -m flownet2_tpu.cli.train \
    --model flownets --dataset flowrec --data-root ${DATA}_train.flowrec \
    --crop 320x448 --batch 8 --max-iter 6016 --schedule S_short \
    --solver adam --base-lr 2e-4 \
    --device-cache 256 --cache-slab 64 --steps-per-dispatch 32 \
    --display 96 --snapshot-dir /tmp/synth5_snaps --snapshot-interval 1504 \
    --seed 3 2>&1 | tee ${OUT}/log_train.txt

python -u - <<'EOF'
import contextlib, io, json, os
from flownet2_tpu.checkpoint import export_snapshot_npz
from flownet2_tpu.cli import test as test_cli

def mean_epe(weights, log_path):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = test_cli.main([
            "--weights", weights, "--model", "flownets",
            "--dataset", "flowrec", "--data-root",
            os.environ.get("SYNTH_PREFIX", "/tmp/synth5") + "_eval.flowrec",
            "--batch", "4",
        ])
    assert rc == 0
    out = buf.getvalue()
    with open(log_path, "w") as f:
        f.write(out)
    line = [l for l in out.splitlines() if l.startswith("Loss:")][-1]
    return float(line.rsplit("=", 1)[1])

curve = [{"iteration": 0, "weights": "random-init",
          "epe": mean_epe("random", "runs/synth/log_eval_init.txt")}]
print(f"init EPE {curve[0]['epe']:.3f}", flush=True)
for snap in sorted(os.listdir("/tmp/synth5_snaps")):
    it = int(snap.split("_")[1])
    npz = f"/tmp/synth5_snaps/{snap}.npz"
    export_snapshot_npz(f"/tmp/synth5_snaps/{snap}", npz)
    epe = mean_epe(npz, f"runs/synth/log_eval_{it:07d}.txt")
    curve.append({"iteration": it, "weights": snap, "epe": epe})
    print(f"iter {it}: held-out EPE {epe:.3f}", flush=True)
with open("runs/synth/epe_curve.json", "w") as f:
    json.dump({"train_samples": 2048, "eval_samples": 64,
               "resolution": "384x512", "crop": "320x448",
               "pipeline": "device-cache + 32-step dispatch",
               "curve": curve}, f, indent=1)
print("wrote runs/synth/epe_curve.json", flush=True)
EOF
