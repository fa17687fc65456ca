#!/usr/bin/env python
"""Config-file usage example.

Counterpart of the reference's ``apps/configobj_usage_example.py``: parse an
INI-style simulation config against an inline spec (with custom
``real_numpy_array`` range-expression validation), filling defaults and
writing the validated file back. The reference uses the ``configobj``
package; this framework ships a standalone validator with the same spec
syntax (``pyphysim_tpu/simulations/configobjvalidation.py``).

Run:  python apps/configobj_usage_example.py [config_file]
"""

import os
import sys

sys.path.insert(0, ".")

from pyphysim_tpu.simulations.configobjvalidation import load_config

SPEC = """[Scenario]
SNR=real_numpy_array(default=15)
modulator=option('PSK', 'QAM', 'BPSK', default="PSK")
M=integer(min=4, max=512, default=4)
NSymbs=integer(min=10, max=1000000, default=200)
K=integer(min=2,default=3)
Nr=integer(min=2,default=2)
Nt=integer(min=2,default=2)
Ns=integer(min=1,default=1)
[IA Algorithm]
max_iterations=integer(min=1, default=60)
[General]
rep_max=integer(min=1, default=2000)
max_bit_errors=integer(min=1, default=3000)
unpacked_parameters=string_list(default=list('SNR'))
"""


def main():
    config_file_name = sys.argv[1] if len(sys.argv) > 1 else \
        "psk_simulation_config.txt"

    if not os.path.exists(config_file_name):
        # Write a small config exercising the range-expression syntax
        with open(config_file_name, "w") as f:
            f.write("[Scenario]\nSNR=0:5:31\nM=16\nmodulator=QAM\n")
        print(f"Wrote example config to {config_file_name}")

    # save_parsed_file=True writes the file back with defaults filled in,
    # like configobj's validate(copy=True) + write()
    conf = load_config(config_file_name, SPEC, save_parsed_file=True)

    # load_config returns a SimulationParameters with all sections
    # flattened and the sweep axes already marked for unpacking
    print("Validated parameters:")
    for name in sorted(conf):
        print(f"  {name} = {conf[name]!r}")
    print("Unpacked (sweep) parameters:", conf.unpacked_parameters)
    print("Number of variations:", conf.get_num_unpacked_variations())


if __name__ == "__main__":
    main()
