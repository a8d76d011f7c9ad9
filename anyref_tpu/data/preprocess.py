"""Image/audio preprocessing.

Replaces the reference's PIL/cv2/torchvision/torchaudio pipeline
(utils/coco_instance.py:403-421, segment_anything/utils/transforms.py:27-34,
ImageBind data.py:28-64) with resize-as-matmul numpy (host pipeline) and the
same ops as jnp (on-device serving path). Both share the exact bilinear
semantics of ops/resize.py.

Host pipeline outputs per image:
  clip_image [3, 224, 224] float32 (CLIP-normalized, force-resize — the
      reference's clip_resize_wo_crop=True path)
  sam_image  [3, 1024, 1024] float32 (SAM-normalized, longest-side-1024 +
      bottom/right zero pad)
  sam_resized_size (h, w) valid extent on the SAM canvas
"""

from __future__ import annotations

import numpy as np

from ..config import SAM_PIXEL_MEAN, SAM_PIXEL_STD
from ..models.clip_vit import CLIP_PIXEL_MEAN, CLIP_PIXEL_STD
from ..ops.resize import get_preprocess_shape, resize_bilinear_np


def _shortest_edge_size(h: int, w: int, short: int) -> tuple[int, int]:
    """transformers get_resize_output_image_size(default_to_square=False):
    shortest edge -> ``short``, other side scaled with int truncation."""
    s, l = (h, w) if h <= w else (w, h)
    new_l = int(short * l / s)
    return (short, new_l) if h <= w else (new_l, short)


def preprocess_clip_np(image_rgb_u8: np.ndarray, size: int = 224) -> np.ndarray:
    """[H, W, 3] uint8 -> [3, size, size] CLIP-normalized float32.

    Exactly the reference pipeline (utils/coco_instance.py:378-415):
    CLIPImageProcessor(do_center_crop=False) = PIL BICUBIC shortest-edge
    resize on uint8 (output re-quantized to uint8 by PIL), rescale 1/255,
    CLIP-normalize; then the clip_resize_wo_crop force-resize to 224x224
    with torch bilinear align_corners=False (ops/resize.py bilinear is
    bit-matched to that). Parity-tested against the real CLIPImageProcessor
    in tests/test_clip_parity.py.
    """
    h, w = image_rgb_u8.shape[:2]
    nh, nw = _shortest_edge_size(h, w, size)
    if (nh, nw) != (h, w):
        from PIL import Image
        im = Image.fromarray(image_rgb_u8).resize((nw, nh), Image.BICUBIC)
        image_rgb_u8 = np.asarray(im)
    x = image_rgb_u8.astype(np.float32).transpose(2, 0, 1)  # [3, nh, nw]
    mean = np.asarray(CLIP_PIXEL_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(CLIP_PIXEL_STD, np.float32).reshape(3, 1, 1)
    x = ((x / 255.0) - mean) / std
    if (nh, nw) != (size, size):
        x = resize_bilinear_np(x, size, size)
    return x


def preprocess_sam_np(image_rgb_u8: np.ndarray,
                      image_size: int = 1024) -> tuple[np.ndarray, tuple[int, int]]:
    """[H, W, 3] uint8 -> ([3, S, S] normalized+padded float32, (h', w'))."""
    h, w = image_rgb_u8.shape[:2]
    nh, nw = get_preprocess_shape(h, w, image_size)
    x = image_rgb_u8.astype(np.float32).transpose(2, 0, 1)
    x = resize_bilinear_np(x, nh, nw)
    mean = np.asarray(SAM_PIXEL_MEAN, np.float32).reshape(3, 1, 1)
    std = np.asarray(SAM_PIXEL_STD, np.float32).reshape(3, 1, 1)
    x = (x - mean) / std
    out = np.zeros((3, image_size, image_size), np.float32)
    out[:, :nh, :nw] = x
    return out, (nh, nw)


def preprocess_clip_u8_np(image_rgb_u8: np.ndarray,
                          size: int = 224) -> np.ndarray:
    """Serving fast path: [H, W, 3] uint8 -> [3, size, size] uint8 PIXELS.

    Same two resizes as :func:`preprocess_clip_np` but kept in the uint8
    pixel domain so the host->device transfer ships 4x fewer bytes over the
    serving tunnel; normalization runs on device
    (clip_vit.normalize_pixels). Bilinear resize commutes exactly with the
    per-channel affine normalize (the interpolation weights sum to 1), so
    the only numeric difference vs the float path is one uint8 quantization
    after the force-resize — the same quantization the reference pipeline
    itself incurs at this stage (PIL resize returns uint8,
    segment_anything/utils/transforms.py:27-34)."""
    h, w = image_rgb_u8.shape[:2]
    nh, nw = _shortest_edge_size(h, w, size)
    if (nh, nw) != (h, w):
        from PIL import Image
        im = Image.fromarray(image_rgb_u8).resize((nw, nh), Image.BICUBIC)
        image_rgb_u8 = np.asarray(im)
    x = image_rgb_u8.transpose(2, 0, 1)  # [3, nh, nw] uint8
    if (nh, nw) != (size, size):
        xf = resize_bilinear_np(x.astype(np.float32), size, size)
        x = np.clip(np.rint(xf), 0, 255).astype(np.uint8)
    return x


def preprocess_sam_u8_np(image_rgb_u8: np.ndarray,
                         image_size: int = 1024) -> tuple[np.ndarray, tuple[int, int]]:
    """Serving fast path: [H, W, 3] uint8 -> ([3, S, S] uint8 PIXEL canvas,
    (h', w')). Normalize + pad-zeroing run on device
    (eval/runner._sam_normalize_device); see preprocess_clip_u8_np for the
    commutation argument."""
    h, w = image_rgb_u8.shape[:2]
    nh, nw = get_preprocess_shape(h, w, image_size)
    x = resize_bilinear_np(
        image_rgb_u8.astype(np.float32).transpose(2, 0, 1), nh, nw)
    out = np.zeros((3, image_size, image_size), np.uint8)
    out[:, :nh, :nw] = np.clip(np.rint(x), 0, 255).astype(np.uint8)
    return out, (nh, nw)


def mask_to_canvas_np(mask: np.ndarray, resized_hw: tuple[int, int],
                      image_size: int = 1024) -> np.ndarray:
    """GT mask [H, W] {0,1} -> float32 [S, S] canvas aligned with the SAM
    frame (nearest resize + pad). Loss-domain note: the reference computes
    mask losses at the original resolution after postprocess
    (anyref.py:425-445); we compute them on the shared canvas with the padded
    region masked out — same optimum, one static shape."""
    nh, nw = resized_hw
    H, W = mask.shape
    ys = np.minimum((np.arange(nh) + 0.5) * H / nh, H - 1).astype(np.int64)
    xs = np.minimum((np.arange(nw) + 0.5) * W / nw, W - 1).astype(np.int64)
    out = np.zeros((image_size, image_size), np.float32)
    out[:nh, :nw] = mask[ys][:, xs].astype(np.float32)
    return out


def crop_box_np(image_rgb_u8: np.ndarray, xyxy: np.ndarray,
                mask: np.ndarray | None = None) -> np.ndarray:
    """Reference-crop extraction for the image-reference pathway
    (reference utils/coco_instance.py:670-683: bbox crop, optional
    mask-multiply)."""
    x1, y1, x2, y2 = [int(round(float(v))) for v in xyxy]
    h, w = image_rgb_u8.shape[:2]
    # clamp the TOP-LEFT inside the image too: callers inset boxes by
    # +[1,1,-1,-1], so a 1px-wide annotation at the right/bottom edge lands
    # x1 == w, which would make a zero-width crop (and a ZeroDivisionError
    # in the CLIP shortest-edge resize downstream)
    x1, y1 = min(max(x1, 0), w - 1), min(max(y1, 0), h - 1)
    x2 = min(max(x2, x1 + 1), w)
    y2 = min(max(y2, y1 + 1), h)
    crop = image_rgb_u8[y1:y2, x1:x2]
    if mask is not None:
        crop = crop * mask[y1:y2, x1:x2, None].astype(crop.dtype)
    return crop
