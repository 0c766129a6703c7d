"""Console entry points for the pip-installed package (T9; the reference
installs via `python setup.py develop`, `SRGAN/pip.sh:7`, and drives
`train.py`/`test.py` from the repo root — here the same surface works from
any cwd after `pip install -e .`)."""

import os


def train_main():
    from .train.pipeline import train_pipeline

    train_pipeline(os.getcwd())


def test_main():
    from .train.pipeline import test_pipeline

    test_pipeline(os.getcwd())


def inference_main():
    from .inference import main

    main()
