#!/usr/bin/env python
"""Offline A/B training-parity run (VERDICT r3 #3, long form).

The CI guard (`tests/test_torch_parity.py::test_ab_training_parity`) runs
12 optimizer steps; this harness runs the same A/B — reference torch
MambaSISR6 (tiny config, pure-torch sequential scan stub) vs the
converted-init OSSNet under matched Adam (lr 2e-4, betas (0.9, 0.99),
see `/root/reference/SRGAN/basicsr/models/MambaSISR_model.py:120-147`
semantics) on identical synthetic batches — for hundreds of iterations
and records the per-step loss curves for docs/PERF.md.

Run on CPU (slow: the torch side single-threads a sequential scan):
  JAX_PLATFORMS=cpu python tools/ab_train.py --iters 300

Prints one JSON line: iters, max/mean relative loss gap, first-K grad
rel errs, both endpoints; writes the full curves to --out (default
/tmp/ab_curves.json).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=300)
    p.add_argument("--check-grads", type=int, default=3)
    p.add_argument("--recipe", default="sisr_adam",
                   choices=["sisr_adam", "derain_adamw", "gan"])
    p.add_argument("--out", default="/tmp/ab_curves.json")
    args = p.parse_args()

    if args.recipe == "gan":
        from test_torch_parity import run_ab_training_gan

        logs_t, logs_j, u_rels = run_ab_training_gan(
            iters=args.iters, verbose=True)
        keys = sorted(logs_t[-1])
        rels = {k: [abs(a[k] - b[k]) / (abs(a[k]) + 1e-12)
                    for a, b in zip(logs_t, logs_j) if k in a]
                for k in keys}
        with open(args.out, "w") as f:
            json.dump({"torch": logs_t, "jax": logs_j,
                       "u_rels": u_rels}, f)
        print(json.dumps({
            "recipe": "gan",
            "iters": args.iters,
            "loss_rel_max": {k: round(max(v), 6) for k, v in rels.items()},
            "loss_rel_mean": {k: round(sum(v) / len(v), 6)
                              for k, v in rels.items()},
            "u_rel_max": round(max(u_rels), 8),
            "curves": args.out,
        }))
        return

    from test_torch_parity import run_ab_training

    losses_t, losses_j, grad_rels = run_ab_training(
        iters=args.iters, check_grads=args.check_grads, verbose=True,
        recipe=args.recipe)

    rels = [abs(a - b) / (abs(a) + 1e-12)
            for a, b in zip(losses_t, losses_j)]
    with open(args.out, "w") as f:
        json.dump({"torch": losses_t, "jax": losses_j,
                   "grad_rel_errs": grad_rels}, f)
    print(json.dumps({
        "recipe": args.recipe,
        "iters": args.iters,
        "grad_rel_errs": [round(g, 6) for g in grad_rels],
        "loss_rel_max": round(max(rels), 6),
        "loss_rel_mean": round(sum(rels) / len(rels), 6),
        "torch_first_last": [round(losses_t[0], 6),
                             round(losses_t[-1], 6)],
        "jax_first_last": [round(losses_j[0], 6),
                           round(losses_j[-1], 6)],
        "curves": args.out,
    }))


if __name__ == "__main__":
    main()
