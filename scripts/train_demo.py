"""Executed training demo on real hardware: distillation + adversarial
steps with checkpointing, loss curve written to docs/TRAIN_DEMO_REPORT.json.

The closed reference weights can't be loaded (binary blobs for a closed
architecture), so the demo distills a randomly-initialized frozen teacher
-- the identical code path a recorded-pair corpus would drive -- and
demonstrates: loss decreases, the GAN step trains both players, steps/s on
the device, checkpoint save/resume.

Usage: PYTHONPATH=. python scripts/train_demo.py [steps] [gan_steps]
"""

import json
import sys
import time

import numpy as np
import jax

from beatrice_vst_tpu.constants import V20RC0
from beatrice_vst_tpu.models import chain
from beatrice_vst_tpu.models.chain import VoiceConverterConfig
from beatrice_vst_tpu.speakers import bank as bank_mod
from beatrice_vst_tpu.training import make_teacher_batcher, train, train_gan

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
GAN_STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
BATCH, FRAMES = 16, 16


def main():
    cfg = VoiceConverterConfig.for_version(V20RC0)
    student = chain.init(jax.random.PRNGKey(0), cfg)
    teacher = chain.init(jax.random.PRNGKey(1), cfg)
    bank = bank_mod.random_bank(jax.random.PRNGKey(2), V20RC0, 4)
    batches = make_teacher_batcher(cfg, teacher, bank, batch=BATCH,
                                   frames=FRAMES, seed=0)
    logs = []

    def log_fn(msg):
        print(msg, flush=True)
        logs.append(msg)

    import tempfile

    ck = tempfile.mkdtemp(prefix="train_demo_ck_")
    t0 = time.time()
    student, hist = train(student, cfg, batches, steps=STEPS, lr=5e-4,
                          log_every=max(1, STEPS // 10), log_fn=log_fn,
                          ckpt_dir=ck, save_every=max(1, STEPS // 2))
    distill_s = time.time() - t0
    # resume from checkpoint for a few more steps (proves restore)
    t1 = time.time()
    student, hist2 = train(student, cfg, batches, steps=STEPS + 10, lr=5e-4,
                           log_every=5, log_fn=log_fn, ckpt_dir=ck,
                           resume=True)
    resume_s = time.time() - t1

    t2 = time.time()
    student, ghist = train_gan(student, cfg, batches, steps=GAN_STEPS,
                               lr=1e-4, log_every=max(1, GAN_STEPS // 5),
                               log_fn=log_fn)
    gan_s = time.time() - t2

    losses = [loss for _, loss in hist]
    report = {
        "device": str(jax.devices()[0]),
        "distill": {
            "steps": STEPS,
            "batch": BATCH,
            "frames_per_example": FRAMES,
            "first_loss": round(losses[0], 4),
            "last_loss": round(losses[-1], 4),
            "loss_curve": [(s, round(v, 4)) for s, v in hist],
            "wall_s": round(distill_s, 1),
            "steps_per_s_steady": round(
                (STEPS - 1) / max(distill_s, 1e-9), 2),
        },
        "resume": {
            "resumed_at": hist2[0][0] if hist2 else None,
            "extra_steps": 10,
            "wall_s": round(resume_s, 1),
        },
        "gan": {
            "steps": GAN_STEPS,
            "g_loss_curve": [(s, round(v, 4)) for s, v in ghist],
            "wall_s": round(gan_s, 1),
        },
        "converged": bool(np.mean(losses[-3:]) < losses[0]),
    }
    with open("docs/TRAIN_DEMO_REPORT.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "distill"} |
                     {"distill_first_last": (report["distill"]["first_loss"],
                                             report["distill"]["last_loss"])}))


if __name__ == "__main__":
    main()
