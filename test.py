#!/usr/bin/env python
"""Evaluation CLI — `python test.py -opt options/test_<config>.yml`.

Reference-compatible surface (`/root/reference/SRGAN/VmambaIR/test.py:14-16`,
`Deraining/basicsr/test.py:12-61`)."""

import os.path as osp

from vmambair_tpu.train.pipeline import test_pipeline

if __name__ == "__main__":
    root_path = osp.abspath(osp.dirname(__file__))
    test_pipeline(root_path)
