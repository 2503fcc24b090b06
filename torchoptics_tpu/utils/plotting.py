"""Spot-diagram plotting (reference ``ShowTraceResult``,
`optics_simulator_lite.py:554-573`, with the missing wavelength→RGB helper
supplied by :mod:`torchoptics_tpu.utils.wavelength`)."""

from __future__ import annotations

import numpy as np

from torchoptics_tpu.utils.wavelength import wavelength_to_rgb


def show_trace_result(x, y, ray_ok, loss_unsup, wavelengths, show=True,
                      ax=None):
    """Scatter the image-plane spot, one color per wavelength.

    Args:
      x, y, ray_ok: (B, F, P, W) trace outputs (system 0 is plotted).
      loss_unsup: scalar shown in the title.
      wavelengths: sequence of wavelengths [nm].

    Returns the matplotlib figure.
    """
    import matplotlib
    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    xd = np.asarray(x)
    yd = np.asarray(y)
    ok = np.asarray(ray_ok)
    ok = np.broadcast_to(ok, np.broadcast_shapes(ok.shape, xd.shape, yd.shape))
    xd, yd = np.broadcast_arrays(xd, yd)

    if ax is None:
        fig = plt.figure()
        fig.suptitle("Unsupervised Loss Function Output:\n"
                     + str(np.asarray(loss_unsup)), fontsize=12)
        ax = fig.add_subplot()
    else:
        fig = ax.figure

    for w, wave in enumerate(wavelengths):
        rgb = wavelength_to_rgb(float(wave))
        color = (rgb[0] / 255, rgb[1] / 255, rgb[2] / 255)
        sel = ok[0, :, :, w]
        ax.plot(xd[0, :, :, w][sel], yd[0, :, :, w][sel], ".",
                color=color, markersize=4)

    ax.axis("equal")
    if show:
        plt.show()
    return fig


def plot_lens_layout(specs, lens, n_rays: int = 7, *, fields=(0.0, 1.0),
                     ax=None, show=True):
    """2-D cross-section of the lens with meridional ray fans overlaid.

    New capability (the reference has no layout plot): surfaces are drawn
    from their sag functions; ray paths come from one traced meridional fan
    per field using the per-surface ``"y"``/``"z"`` aggregate stacks.
    """
    import jax
    import matplotlib.pyplot as plt
    from torchoptics_tpu.ops import trace as trace_mod

    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 4))
    else:
        fig = ax.figure

    t = np.asarray(lens.t)[0]
    c = np.asarray(lens.c)[0]
    n_surf = int(lens.structure.n_surfaces[0])
    vertex = np.concatenate(([0.0], np.cumsum(t)))[:n_surf]

    # Draw each surface to its effective semi-aperture (the reference's
    # dormant find_effective_aperture intent).
    from torchoptics_tpu.ops import metrics as metrics_mod
    semi_ap = np.asarray(metrics_mod.compute_semi_apertures(specs, lens))[0]
    semi_ap = np.maximum(semi_ap * 1.05, 1e-3)
    for k in range(n_surf):
        h = np.linspace(-semi_ap[k], semi_ap[k], 61)
        ck = c[k]
        kap = 0.0 if lens.kappa is None else float(np.asarray(lens.kappa)[0, k])
        r2 = h ** 2
        u = (1 + kap) * ck ** 2 * r2
        valid = 1 - u > 1e-6
        sag = np.where(valid, ck * r2 / (1 + np.sqrt(np.clip(1 - u, 1e-6, None))), np.nan)
        if lens.asph is not None:
            a = np.asarray(lens.asph)[0, k]
            for j, aj in enumerate(a):
                sag = sag + aj * r2 ** (j + 2)
        ax.plot(vertex[k] + sag, h, "k-", lw=1)

    z_img = vertex[-1] + t[n_surf - 1]
    ax.axvline(z_img, color="gray", lw=1, ls="--")

    # Meridional fan per field: per-surface hits from the "y"/"z" aggregate
    # stacks ("z" is recorded after the z -= t_k frame shift, so the global
    # hit is vertex[k] + z_k + t_k).
    cfg = trace_mod.TraceConfig(
        mode="meridional_uniform", n_rays=(int(n_rays),),
        rel_fields=tuple(float(f) for f in fields), wavelengths=("d",),
        n_ray_aiming_iter=1)
    res = jax.jit(lambda l: trace_mod.trace_rays(
        specs, l, cfg, aggregate=("y", "z")))(lens)
    y_hits = np.asarray(res.stacks["y"])[:n_surf, 0]      # (S, F, P, 1)
    z_hits = (np.asarray(res.stacks["z"])[:n_surf, 0]
              + (vertex + t[:n_surf])[:, None, None, None])
    y_img = np.asarray(res.y)[0]                          # (F, P, 1)
    ok = np.asarray(res.ray_ok)[0]
    u = float(np.asarray(specs.hfov)[0])
    z_start = vertex[0] - 0.12 * max(z_img - vertex[0], 1e-6)
    colors = plt.cm.viridis(np.linspace(0.0, 0.8, len(cfg.rel_fields)))
    for f in range(len(cfg.rel_fields)):
        ty = np.tan(u * cfg.rel_fields[f])
        for r in range(y_hits.shape[2]):
            if not ok[f, r, 0]:
                continue
            zs = np.concatenate(([z_start], z_hits[:, f, r, 0], [z_img]))
            # entry segment: extrapolate the incoming field angle backwards
            y0 = y_hits[0, f, r, 0] - (z_hits[0, f, r, 0] - z_start) * ty
            ys = np.concatenate(([y0], y_hits[:, f, r, 0], [y_img[f, r, 0]]))
            ax.plot(zs, ys, "-", color=colors[f], lw=0.7, alpha=0.8)

    ax.set_xlabel("z")
    ax.set_ylabel("y")
    ax.set_title("Lens layout")
    if show:
        plt.show()
    return fig
