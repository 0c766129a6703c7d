"""`python -m vmambair_tpu.train -opt <config>.yml`"""

from ..cli import train_main

train_main()
