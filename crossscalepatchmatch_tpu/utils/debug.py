"""Debug / introspection utilities.

The reference gates visual and per-pixel debugging behind MY_DEBUG:
ViewDisp shows the current disparity map, PrintPixelInfo dumps one
pixel's plane + cost (cs_patchmatch.h:25-53, call sites
cs_patchmatch.cc:56-101), PrintMat dumps a matrix (commfunc.h:91-104),
and VIEW_PP dumps post-processing intermediates (cs_patchmatch.cc:
518-540).  The batch-friendly TPU analogues below operate on the state
arrays returned by models.pipeline.run_pair / models.patchmatch.
"""

from __future__ import annotations

import sys

import numpy as np


def print_array(name: str, arr, file=sys.stderr) -> None:
    """PrintMat analogue: shape/dtype/range summary plus small-array dump."""
    a = np.asarray(arr)
    print(f"{name}: shape={a.shape} dtype={a.dtype} "
          f"min={a.min():.6g} max={a.max():.6g} mean={a.mean():.6g}",
          file=file)
    if a.size <= 400:
        print(np.array2string(a, precision=4, suppress_small=True),
              file=file)


def pixel_info(out: dict, x: int, y: int, dis_scale: int = 1,
               file=sys.stderr) -> dict:
    """PrintPixelInfo analogue: one pixel's plane, disparity, and cost.

    Args:
      out: run_pair output dict ("abc", "cost", "dis", optionally "valid").
      dis_scale: the config's output scale, so the plane disparity can be
        printed in the same scaled units as the u8 map for comparison.
    """
    info = {}
    for v, view in enumerate(("left", "right")):
        a, b, c = (float(t) for t in np.asarray(out["abc"])[v, y, x])
        d = a * x + b * y + c
        info[view] = {
            "abc": (a, b, c),
            "disparity": d,
            "dis_scaled": d * dis_scale,
            "dis_u8": int(np.asarray(out["dis"])[v, y, x]),
            "min_cost": float(np.asarray(out["cost"])[v, y, x]),
        }
        if "valid" in out:
            info[view]["valid"] = bool(np.asarray(out["valid"])[v, y, x])
        print(f"({x},{y}) {view}: d={d:.4f} (x{dis_scale} = "
              f"{d * dis_scale:.2f}, map u8 = {info[view]['dis_u8']}) "
              f"plane=({a:.4f},{b:.4f},{c:.4f})"
              f" cost={info[view]['min_cost']:.6g}"
              + (f" valid={info[view].get('valid')}" if "valid" in out
                 else ""),
              file=file)
    return info


def disparity_to_color(dis: np.ndarray, max_val: int | None = None
                       ) -> np.ndarray:
    """ViewDisp analogue: u8 disparity map -> u8[H, W, 3] RGB turbo-ish
    colormap (near = warm, far = cold), for visual inspection dumps."""
    d = np.asarray(dis, np.float32)
    mx = float(max_val if max_val is not None else max(d.max(), 1.0))
    t = np.clip(d / mx, 0.0, 1.0)
    # compact 4-stop gradient: dark blue -> cyan -> yellow -> red
    stops = np.array([[0, 0, 96], [0, 208, 208], [240, 240, 0],
                      [224, 0, 0]], np.float32)
    pos = t * 3.0
    i = np.clip(pos.astype(np.int32), 0, 2)
    f = (pos - i)[..., None]
    rgb = stops[i] * (1.0 - f) + stops[i + 1] * f
    return rgb.astype(np.uint8)


def save_debug_dumps(out: dict, prefix: str) -> list:
    """VIEW_PP analogue: write disparity (gray + color) and validity maps.

    Returns the list of files written ("<prefix>_{l,r}_{dis,color,valid}.png").
    """
    from .. import io as cio

    written = []
    dis = np.asarray(out["dis"])
    for v, tag in enumerate(("l", "r")):
        p = f"{prefix}_{tag}_dis.png"
        cio.write_gray(p, dis[v])
        written.append(p)
        pc = f"{prefix}_{tag}_color.png"
        _write_rgb(pc, disparity_to_color(dis[v]))
        written.append(pc)
        if "valid" in out:
            pv = f"{prefix}_{tag}_valid.png"
            cio.write_gray(pv, np.asarray(out["valid"])[v].astype(np.uint8)
                           * 255)
            written.append(pv)
    return written


def _write_rgb(path: str, rgb_u8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(rgb_u8).save(path)
