# %% [markdown]
# # Path loss models
#
# Tutorial counterpart of the reference's `PathLoss_classes.ipynb`: a tour
# of every path loss model in `pyphysim_tpu.channels.pathloss` — free
# space, the general A + B log10(d) form, 3GPP, METIS PS7 indoor (with
# wall losses) and Okomura-Hata — plus log-normal shadowing and the
# inverse `which_distance` queries. All models evaluate vectorized over
# distance arrays (numpy on host, jnp under jit).
#
# Runs as a script or as percent-format notebook cells.

# %%
import numpy as np

from pyphysim_tpu.channels.pathloss import (PathLoss3GPP1, PathLossFreeSpace,
                                            PathLossGeneral,
                                            PathLossMetisPS7,
                                            PathLossOkomuraHata)

d = np.linspace(0.05, 5.0, 100)  # distances in km

# %% [markdown]
# ## Free space
#
# `PL = 10 n log10(d) + 10 log10((4 pi fc / c)^2)` with path loss exponent
# n = 2 by default. Frequency matters: compare 900 MHz against 2.6 GHz.

# %%
pl_fs_900 = PathLossFreeSpace(n=2, fc=900.0)
pl_fs_2600 = PathLossFreeSpace(n=2, fc=2600.0)
print("Free space @1km, 900 MHz: ",
      float(pl_fs_900.calc_path_loss_dB(1.0)), "dB")
print("Free space @1km, 2600 MHz:",
      float(pl_fs_2600.calc_path_loss_dB(1.0)), "dB")

# %% [markdown]
# ## General A + B log10(d), 3GPP and Okomura-Hata

# %%
pl_general = PathLossGeneral(n=3.7, C=120.9)
pl_3gpp = PathLoss3GPP1()          # 128.1 + 37.6 log10(d)
pl_hata = PathLossOkomuraHata()
pl_hata.fc = 900.0
pl_hata.hbs = 30.0
pl_hata.hms = 1.5
pl_hata.area_type = "medium city"
print("General   @1km:", float(pl_general.calc_path_loss_dB(1.0)), "dB")
print("3GPP      @1km:", float(pl_3gpp.calc_path_loss_dB(1.0)), "dB")
print("OkomuraHata@1km:", float(pl_hata.calc_path_loss_dB(1.0)), "dB")

# %% [markdown]
# ## METIS PS7 indoor, with walls
#
# The indoor model takes the number of walls crossed; distances here are
# in meters.

# %%
import jax.numpy as jnp

pl_metis = PathLossMetisPS7(fc=2600.0)
d_m = jnp.asarray([5.0, 15.0, 30.0])
for walls in (0, 1, 3):
    vals = pl_metis._calc_deterministic_path_loss_dB(
        d_m, num_walls=jnp.full(d_m.shape, walls, dtype=int))
    print(f"METIS PS7, {walls} walls:", np.asarray(vals).round(1), "dB")

# %% [markdown]
# ## Shadowing and the inverse query
#
# Every model can add log-normal shadowing, and `which_distance_dB`
# inverts the deterministic model: given a loss budget, how far does the
# signal reach?

# %%
pl_3gpp.use_shadow_bool = True
pl_3gpp.sigma_shadow = 8.0
sample = pl_3gpp.calc_path_loss_dB(np.full(5, 1.0))
print("3GPP @1km with 8 dB shadowing:", np.asarray(sample).round(1))
pl_3gpp.use_shadow_bool = False

budget_dB = 130.0
print(f"3GPP range at {budget_dB} dB budget:",
      float(pl_3gpp.which_distance_dB(budget_dB)), "km")

# %% [markdown]
# ## The full picture

# %%
try:
    from matplotlib import pyplot as plt
    for name, model in [("free space 2.6 GHz", pl_fs_2600),
                        ("general n=3.7", pl_general),
                        ("3GPP", pl_3gpp),
                        ("Okomura-Hata urban", pl_hata)]:
        plt.plot(d, np.asarray(model.calc_path_loss_dB(d)), label=name)
    plt.xlabel("distance (km)"), plt.ylabel("path loss (dB)")
    plt.legend(), plt.grid(True)
    plt.savefig("pathloss_models.png", dpi=120)
    print("Saved pathloss_models.png")
except ImportError:
    pass
