"""Model-specific image preprocessing strategies (clip_image_preprocess,
examples/llava/clip.cpp:2365 dispatch):

  llava-1.6    pick the best pinpoint resolution, resize-and-pad, divide
               into image_size crops + a base resize; embeddings are merged
               back into a spatial grid with image_newline columns
               (clip_llava_handle_patches, llava.cpp)
  minicpmv     LLaVA-UHD slicing (uhd_slice_image, clip.cpp:2286): a
               source resize plus an aspect-matched grid of refined slices
  qwen2vl      native resolution rounded up to multiples of 2*patch_size
  glm/gemma3   plain square resize (handled by preprocess_image)

Resizes use bilinear (the reference uses bicubic; within test tolerance).
"""
from __future__ import annotations

import math

import numpy as np


def bilinear_resize(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """HxWx3 float/uint8 -> th x tw x 3 float32 (half-pixel centers)."""
    img = np.asarray(img, np.float32)
    H, W = img.shape[:2]
    ys = (np.arange(th) + 0.5) * H / th - 0.5
    xs = (np.arange(tw) + 0.5) * W / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    return (img[y0][:, x0] * (1 - wy) * (1 - wx)
            + img[y0][:, x1] * (1 - wy) * wx
            + img[y1][:, x0] * wy * (1 - wx)
            + img[y1][:, x1] * wy * wx)


def normalize(img: np.ndarray, mean, std) -> np.ndarray:
    """HxWx3 in [0,255] -> [3,H,W] normalized float32."""
    x = np.asarray(img, np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return x.transpose(2, 0, 1)


# --------------------------------------------------------------------------
# llava-1.6 pinpoints (clip.cpp:2162 select_best_resolution + llava.cpp)
# --------------------------------------------------------------------------

def select_best_resolution(original_wh, possible_resolutions):
    """Pick the pinpoint maximizing effective resolution then minimizing
    waste (select_best_resolution, clip.cpp:2162)."""
    ow, oh = original_wh
    best, max_eff, min_waste = None, 0, float("inf")
    for (w, h) in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste, best = eff, waste, (w, h)
    return best


def resize_and_pad_image(img: np.ndarray, target_wh) -> np.ndarray:
    """Aspect-preserving resize centered on a black canvas
    (resize_and_pad_image, clip.cpp:2130)."""
    tw, th = target_wh
    H, W = img.shape[:2]
    scale_w, scale_h = tw / W, th / H
    if scale_w < scale_h:
        nw, nh = tw, min(int(math.ceil(H * scale_w)), th)
    else:
        nh, nw = th, min(int(math.ceil(W * scale_h)), tw)
    resized = bilinear_resize(img, nw, nh)
    out = np.zeros((th, tw, 3), np.float32)
    py, px = (th - nh) // 2, (tw - nw) // 2
    out[py:py + nh, px:px + nw] = resized
    return out


def divide_to_patches(img: np.ndarray, patch: int) -> list:
    """Row-major image_size crops (divide_to_patches_u8, clip.cpp:2188)."""
    H, W = img.shape[:2]
    return [img[i:i + patch, j:j + patch]
            for i in range(0, H, patch) for j in range(0, W, patch)]


def llava16_preprocess(img: np.ndarray, image_size: int, pinpoints,
                       mean, std):
    """-> (pixel batch [1+n, 3, S, S], grid (npw, nph)).  Index 0 is the
    base resize; crops follow row-major (clip_image_preprocess pinpoints
    branch, clip.cpp:2471)."""
    resolutions = [(pinpoints[i], pinpoints[i + 1])
                   for i in range(0, len(pinpoints), 2)]
    best = select_best_resolution((img.shape[1], img.shape[0]), resolutions)
    padded = resize_and_pad_image(img, best)
    crops = divide_to_patches(padded, image_size)
    base = bilinear_resize(img, image_size, image_size)
    batch = np.stack([normalize(p, mean, std) for p in [base] + crops])
    return batch, (best[0] // image_size, best[1] // image_size)


def llava16_merge_embeds(embeds: np.ndarray, grid, n_per_side: int,
                         newline: np.ndarray | None) -> np.ndarray:
    """Merge [1+n, P*P, D] crop embeddings into the llava-1.6 token layout
    (clip_llava_handle_patches, llava.cpp — the confirmed-identical
    "no unpad" permutation): base tokens first, then the spatial grid
    rows with an image_newline column at the end of each row."""
    npw, nph = grid
    base, crops = embeds[0], embeds[1:]
    D = base.shape[-1]
    s = n_per_side
    x = crops.reshape(nph, npw, s, s, D)
    x = x.transpose(0, 2, 1, 3, 4).reshape(nph * s, npw * s, D)
    if newline is not None:
        col = np.broadcast_to(np.asarray(newline, np.float32),
                              (nph * s, 1, D))
        x = np.concatenate([x, col], axis=1)
    return np.concatenate([base, x.reshape(-1, D)], axis=0)


# --------------------------------------------------------------------------
# minicpmv LLaVA-UHD slicing (clip.cpp:2213-2359, literal port)
# --------------------------------------------------------------------------

def ensure_divide(length: int, patch_size: int) -> int:
    return max(int(round(length / patch_size) * patch_size), patch_size)


def uhd_find_best_resize(original_wh, scale_resolution: int,
                         patch_size: int, allow_upscale: bool = False):
    w, h = original_wh
    if w * h > scale_resolution * scale_resolution or allow_upscale:
        r = w / h
        h = int(scale_resolution / math.sqrt(r))
        w = int(h * r)
    return ensure_divide(w, patch_size), ensure_divide(h, patch_size)


def uhd_get_refine_size(original_wh, grid, scale_resolution: int,
                        patch_size: int, allow_upscale: bool = False):
    w, h = original_wh
    gx, gy = grid
    rw, rh = ensure_divide(w, gx), ensure_divide(h, gy)
    bw, bh = uhd_find_best_resize((rw // gx, rh // gy), scale_resolution,
                                  patch_size, allow_upscale)
    return bw * gx, bh * gy


def uhd_best_grid(max_slice_nums: int, multiple: int, log_ratio: float):
    candidates = []
    for i in (multiple - 1, multiple, multiple + 1):
        if i == 1 or i > max_slice_nums:
            continue
        for m in range(1, i + 1):
            if i % m == 0:
                candidates.append((m, i // m))
    best, min_err = (1, 1), float("inf")
    for g in candidates:
        err = abs(log_ratio - math.log(g[0] / g[1]))
        if err < min_err:
            best, min_err = g, err
    return best


def uhd_slice_image(img: np.ndarray, max_slice_nums: int = 9,
                    scale_resolution: int = 448, patch_size: int = 14):
    """-> (source image, slice rows [[img,...],...], best_grid (gx, gy)).
    Literal port of uhd_slice_image (clip.cpp:2286): the aspect-matched
    grid of refined slices is empty when the image is small enough."""
    H, W = img.shape[:2]
    log_ratio = math.log(W / H)
    ratio = W * H / (scale_resolution * scale_resolution)
    multiple = min(math.ceil(ratio), max_slice_nums)

    if multiple <= 1:
        bw, bh = uhd_find_best_resize((W, H), scale_resolution, patch_size,
                                      allow_upscale=True)
        return bilinear_resize(img, bw, bh), [], (1, 1)

    bw, bh = uhd_find_best_resize((W, H), scale_resolution, patch_size)
    source = bilinear_resize(img, bw, bh)
    grid = uhd_best_grid(max_slice_nums, multiple, log_ratio)
    rw, rh = uhd_get_refine_size((W, H), grid, scale_resolution, patch_size,
                                 allow_upscale=True)
    refined = bilinear_resize(img, rw, rh)
    gx, gy = grid
    sw, sh = rw // gx, rh // gy
    rows = [[refined[i * sh:(i + 1) * sh, j * sw:(j + 1) * sw]
             for j in range(gx)] for i in range(gy)]
    return source, rows, grid


# --------------------------------------------------------------------------
# qwen2vl native resolution (clip_image_preprocess merger branch)
# --------------------------------------------------------------------------

def qwen2vl_resize(img: np.ndarray, patch_size: int,
                   max_pixels: int = 0) -> np.ndarray:
    """Round the native resolution up to multiples of 2*patch_size
    (clip.cpp:2395); optionally bound the total pixel count first."""
    H, W = img.shape[:2]
    if max_pixels and H * W > max_pixels:
        s = math.sqrt(max_pixels / (H * W))
        H, W = int(H * s), int(W * s)
    unit = patch_size * 2
    nw = int(math.ceil(W / unit) * unit)
    nh = int(math.ceil(H / unit) * unit)
    return bilinear_resize(img, nw, nh)
