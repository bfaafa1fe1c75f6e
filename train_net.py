#!/usr/bin/env python
"""Drop-in equivalent of the reference's root-level train_net.py
(/root/reference/train_net.py): config-driven training CLI.  Thin alias for
``python -m rba_tpu.train.train_net``."""
from rba_tpu.train.train_net import main

if __name__ == "__main__":
    main()
