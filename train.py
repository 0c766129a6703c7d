#!/usr/bin/env python
"""Training CLI — `python train.py -opt options/<config>.yml`.

Reference-compatible surface (`/root/reference/SRGAN/VmambaIR/train.py:19-21`,
`Deraining/basicsr/train.py:24-34`): same `-opt/--launcher/--auto_resume/
--force_yml` flags. No `torch.distributed.launch` — JAX is single-controller
SPMD; one process drives all local TPU chips (multi-host pods via
`jax.distributed.initialize`, auto-detected)."""

import os.path as osp

from vmambair_tpu.train.pipeline import train_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.dirname(__file__))
    train_pipeline(root_path)
