#!/usr/bin/env python
"""Dense indoor scenario: AP association, SINR and per-user capacity.

Counterpart of the reference's
``apps/metis_scenarios/simulate_metis_scenario2.py`` (METIS Test Case 2,
one floor, indoor APs only): a grid of square rooms with APs every
``ap_decimation`` rooms, random user drops, METIS PS7 path loss plus
per-wall penetration loss, best-channel AP association, and the resulting
SINR and spectral efficiency — the bandwidth of an AP is split among its
associated users, and only APs with at least one user transmit.

All the per-(user, AP) math is one vectorized program.

Run:  python apps/metis_scenarios/simulate_metis_scenario2.py
         [--users 100] [--rooms 12] [--ap-decimation 2]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from pyphysim_tpu.channels.pathloss import PathLossMetisPS7
from pyphysim_tpu.utils.conversion import dBm2Linear, linear2dB


def calc_room_positions_square(side_length, num_rooms):
    """Center positions of a square grid of square rooms (complex plane),
    reference simulate_metis_scenario.py calc_room_positions_square."""
    per_side = int(round(np.sqrt(num_rooms)))
    idx = np.arange(per_side) - (per_side - 1) / 2.0
    pos = side_length * (idx[None, :] + 1j * idx[:, None])
    return pos.ravel()

def get_ap_positions(room_positions, ap_decimation=1):
    """Keep one AP every ``ap_decimation`` rooms (valid: 1, 2, 4, 9)."""
    if ap_decimation == 1:
        return room_positions.ravel()
    per_side = room_positions.shape[0]
    step = {2: (1, 2), 4: (2, 2), 9: (3, 3)}[ap_decimation]
    offset = {2: (0, 0), 4: (1, 0), 9: (1, 1)}[ap_decimation]
    mask = np.zeros((per_side, per_side), dtype=bool)
    if ap_decimation == 2:
        mask[(np.add.outer(np.arange(per_side),
                           np.arange(per_side)) % 2) == 0] = True
    else:
        mask[offset[0]::step[0], offset[1]::step[1]] = True
    return room_positions[mask].ravel()

def calc_num_walls(side_length, user_positions, ap_positions):
    """Number of walls between each user and each AP (rooms crossed,
    manhattan count)."""
    dx = np.abs(user_positions[:, None].real - ap_positions[None, :].real)
    dy = np.abs(user_positions[:, None].imag - ap_positions[None, :].imag)
    return ((dx + side_length / 2) // side_length +
            (dy + side_length / 2) // side_length).astype(int)


def simulate(num_users=100, num_rooms_per_side=12, side_length=10.0,
             single_wall_loss_dB=5.0, ap_decimation=2, Pt_dBm=20.0,
             noise_power_dBm=-94.0, seed=0):
    num_rooms = num_rooms_per_side ** 2
    Pt = dBm2Linear(Pt_dBm)
    noise_var = dBm2Linear(noise_power_dBm)

    room_positions = calc_room_positions_square(side_length, num_rooms)
    room_grid = room_positions.reshape(num_rooms_per_side,
                                       num_rooms_per_side)
    ap_positions = get_ap_positions(room_grid, ap_decimation)

    rng = np.random.RandomState(seed)
    span = num_rooms_per_side * side_length
    users = span * (rng.random_sample(num_users) - 0.5 +
                    1j * (rng.random_sample(num_users) - 0.5))

    dists = np.maximum(np.abs(users[:, None] - ap_positions[None, :]), 0.1)
    walls = calc_num_walls(side_length, users, ap_positions)

    pl_obj = PathLossMetisPS7(fc=2600.0)
    pl_dB = np.asarray(pl_obj._calc_deterministic_path_loss_dB(
        jnp.asarray(dists), num_walls=jnp.asarray(walls)))
    # channel gain including wall penetration loss, linear
    gains = 10.0 ** (-(pl_dB + single_wall_loss_dB * walls) / 10.0)

    # best-channel association; only APs with >=1 user transmit
    ap_assoc = np.argmax(gains, axis=-1)
    transmitting = np.unique(ap_assoc)
    g_tx = gains[:, transmitting]                       # (users, tx aps)

    desired_idx = np.searchsorted(transmitting, ap_assoc)
    desired = Pt * g_tx[np.arange(num_users), desired_idx]
    total = Pt * g_tx.sum(axis=-1)
    sinr = desired / (total - desired + noise_var)
    users_per_ap = np.bincount(ap_assoc, minlength=ap_positions.size)
    share = users_per_ap[ap_assoc]
    capacity = np.log2(1.0 + sinr) / share
    return linear2dB(sinr), capacity, transmitting.size, ap_positions.size


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--users", type=int, default=100)
    parser.add_argument("--rooms", type=int, default=12,
                        help="rooms per side")
    parser.add_argument("--ap-decimation", type=int, default=2,
                        choices=[1, 2, 4, 9])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    sinr_dB, capacity, num_tx, num_aps = simulate(
        num_users=args.users, num_rooms_per_side=args.rooms,
        ap_decimation=args.ap_decimation, seed=args.seed)

    print(f"{args.users} users, {num_aps} APs "
          f"(decimation {args.ap_decimation}), {num_tx} transmitting")
    print(f"SINR (dB):  mean {sinr_dB.mean():7.2f}  "
          f"p10 {np.percentile(sinr_dB, 10):7.2f}  "
          f"p90 {np.percentile(sinr_dB, 90):7.2f}")
    print(f"Capacity:   mean {capacity.mean():7.3f}  "
          f"p10 {np.percentile(capacity, 10):7.3f}  "
          f"p90 {np.percentile(capacity, 90):7.3f}  bits/s/Hz per user")


if __name__ == "__main__":
    main()
