#!/usr/bin/env python
"""Multiprocess progressbar demo.

Counterpart of the reference's ``apps/testing_multiprocessing_progressbar.py``:
N worker processes each register a proxy progressbar with a
``ProgressbarMultiProcessServer``; a daemon thread in the parent aggregates
the counts into one bar.

Run:  python apps/testing_multiprocessing_progressbar.py
"""

import multiprocessing
import sys

sys.path.insert(0, ".")

import numpy as np

from pyphysim_tpu.progressbar import ProgressbarMultiProcessServer


def func(rep_max, progressbar):
    c = None
    for i in range(rep_max):
        a = np.random.randn(3, 3)
        b = np.random.randn(3, 3)
        c = np.linalg.inv(a @ b)
        if i % 100 == 0:
            progressbar.progress(i)
    progressbar.progress(rep_max)
    return c


def main():
    pb = ProgressbarMultiProcessServer(message="Running")
    num_process = 4
    rep_max = 20000

    procs = []
    for _ in range(num_process):
        proxy = pb.register_client_and_get_proxy_progressbar(rep_max)
        procs.append(multiprocessing.Process(target=func,
                                             args=[rep_max, proxy]))

    for proc in procs:
        proc.start()
    pb.start_updater()
    for proc in procs:
        proc.join()
    pb.stop_updater()
    print()


if __name__ == "__main__":
    main()
