"""Directory-driven ImageNet top-1 eval over the int8 serving chain.

The BASELINE north-star accuracy metric is ImageNet top-1 (within 0.5% of
FP32 for INT8). No ImageNet ships in this zero-egress image, so this entry
point is built to be DATA-READY: point --data-dir at a standard ImageNet
validation tree (``val/<class_dir>/*.JPEG``, class dirs sorted = label
order, the torchvision ImageFolder convention) and it evaluates top-1
through the full serving input pipeline — native PrefetchLoader
(C++ fused normalize+quantize, runtime/native.py:125) -> pre-quantized
int8 QTensor -> apply_quantized_int8chain. Weights come from a quantized
``.lbq`` checkpoint (utils/checkpoint.py) holding qparams + calibrated act
scales; convert a torchvision ResNet with models/convert.py
(resnet_from_torch_state_dict) + quantize_params + calibrate_act_scales,
then save_quantized.

Without --data-dir (or when the directory is absent) it falls back to the
sklearn handwritten-digits set rendered as uint8 image files in a
class-per-directory tree — the SAME code path end to end (directory walk,
image decode, PrefetchLoader, prequantized chain), exercised in CI today,
ImageNet-ready the day data appears. A small ResNet is QAT-trained on the
digits train split first (the accuracy_parity.py recipe) so the measured
top-1 is a real number (~0.9), not chance.

Reference anchor: the reference has no eval loop at all (its accuracy
evidence is the annealing-MNIST objective, python/tmp.py:123-150); this is
the production-shaped replacement demanded by BASELINE.json.

Run:  python examples/imagenet_eval.py [--data-dir DIR] [--checkpoint F]
      [--batch N] [--hw 224] [--steps 400]
Writes imagenet_eval.json (or imagenet_eval_digits.json for the fallback).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from lowbitdnn_project_tpu.models import resnet
from lowbitdnn_project_tpu.quant import QTensor
from lowbitdnn_project_tpu.runtime.native import PrefetchLoader
from lowbitdnn_project_tpu.utils.checkpoint import (load_quantized,
                                                    save_quantized)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# --------------------------------------------------------------------------
# Directory walking + decoding (torchvision-ImageFolder convention)

def list_image_tree(root):
    """[(path, label)] for <root>/<class>/<img>; sorted class dirs define
    the label indices (the torchvision ImageFolder convention)."""
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise ValueError(f"{root}: no class subdirectories")
    samples = []
    for li, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".jpeg", ".jpg", ".png", ".bmp", ".npy")):
                samples.append((os.path.join(cdir, f), li))
    if not samples:
        raise ValueError(f"{root}: class dirs contain no images")
    return samples, classes


def decode_resize_center_crop(path, hw):
    """uint8 HWC at (hw, hw): shorter-side resize to 1.146*hw (256/224) then
    center crop — the standard ImageNet eval transform. .npy files are
    consumed directly (the digits fallback writes those; also handy for
    pre-decoded ImageNet)."""
    if path.endswith(".npy"):
        img = np.load(path)
        assert img.dtype == np.uint8 and img.shape == (hw, hw, 3), (
            path, img.shape, img.dtype)
        return img
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - env without PIL
        raise RuntimeError(
            "JPEG decoding needs PIL (pillow); pre-decode the dataset to "
            ".npy uint8 HWC files instead") from e
    im = Image.open(path).convert("RGB")
    w, h = im.size
    short = min(w, h)
    rs = max(int(round(hw * 256 / 224)), hw)
    im = im.resize((max(1, round(w * rs / short)),
                    max(1, round(h * rs / short))), Image.BILINEAR)
    w, h = im.size
    left, top = (w - hw) // 2, (h - hw) // 2
    im = im.crop((left, top, left + hw, top + hw))
    return np.asarray(im, np.uint8)


def iter_batches(samples, hw, batch):
    for i in range(0, len(samples), batch):
        chunk = samples[i:i + batch]
        imgs = np.stack([decode_resize_center_crop(p, hw)
                         for p, _ in chunk])
        yield imgs, np.asarray([l for _, l in chunk], np.int32)


# --------------------------------------------------------------------------
# The eval loop (shared by ImageNet and the digits fallback)

def evaluate_top1(qparams, act_scales, cfg, samples, hw, batch,
                  mean=IMAGENET_MEAN, std=IMAGENET_STD):
    """Top-1 over a [(path, label)] list through the serving input path:
    PrefetchLoader (C++ normalize+quantize threads overlap the device
    compute) -> prequantized int8 chain -> argmax."""
    in_scale = jnp.asarray(act_scales["conv1"], jnp.float32)

    @jax.jit
    def forward(x_int8):
        x_q = QTensor(values=x_int8, scale=in_scale)
        return resnet.apply_quantized_int8chain(
            qparams, x_q, act_scales, cfg, backend="xla")

    n_correct = n_total = 0
    with PrefetchLoader(mean, std, float(in_scale), hw=(hw, hw)) as loader:
        pending = []           # labels for submitted-not-yet-consumed batches
        it = iter_batches(samples, hw, batch)
        DEPTH = 2              # keep the C++ workers ahead of the device
        done = False
        while not done or pending:
            while not done and len(pending) < DEPTH:
                try:
                    imgs, labels = next(it)
                    loader.submit(imgs)
                    pending.append(labels)
                except StopIteration:
                    done = True
            labels = pending.pop(0)
            x_int8 = loader.get()
            logits = forward(jnp.asarray(x_int8))
            pred = np.asarray(jnp.argmax(logits, -1))
            n_correct += int((pred == labels[:len(pred)]).sum())
            n_total += len(labels)
    return n_correct / n_total, n_total


# --------------------------------------------------------------------------
# Digits fallback: render the sklearn digits test split as an image tree

def build_digits_tree(root, hw=32, train_n=1280):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _datasets import load_digits_split

    x_tr, y_tr, x_te, y_te = load_digits_split(hw=hw, channels=3,
                                               train_n=train_n)
    os.makedirs(root, exist_ok=True)
    for i in range(int(jnp.max(y_te)) + 1):
        os.makedirs(os.path.join(root, f"{i:04d}"), exist_ok=True)
    u8 = np.clip(np.asarray(x_te) * 255.0, 0, 255).astype(np.uint8)
    for j in range(u8.shape[0]):
        np.save(os.path.join(root, f"{int(y_te[j]):04d}", f"{j:05d}.npy"),
                u8[j])
    # relabel/resort exactly as list_image_tree will see it
    return (x_tr, y_tr, x_te, y_te)


def train_digits_checkpoint(ckpt_path, data, cfg, steps, batch=64, seed=0):
    """QAT-train the small ResNet on digits, quantize, calibrate, save —
    produces the same .lbq artifact an ImageNet deployment would ship."""
    from lowbitdnn_project_tpu.train.qat import make_qat_train_step

    x_train, y_train = data[0], data[1]
    params = resnet.init_params(jax.random.key(seed), cfg)
    step = jax.jit(make_qat_train_step(
        lambda p, xx: resnet.apply_fp32(p, xx, cfg), bits=8, lr=3e-3))
    nb = x_train.shape[0] // batch
    for it in range(steps):
        i = it % nb
        params, loss = step(params, x_train[i * batch:(i + 1) * batch],
                            y_train[i * batch:(i + 1) * batch])
        if it % 200 == 0:
            print(f"  step {it}: loss {float(loss):.4f}", flush=True)
    cal = [x_train[i * 128:(i + 1) * 128] for i in range(4)]
    scales = resnet.calibrate_act_scales(params, cal, cfg)
    qp = resnet.quantize_params(params, cfg, bits=8)
    save_quantized(ckpt_path, {"qparams": qp, "act_scales": scales,
                               "cfg": {"stage_blocks": list(cfg.stage_blocks),
                                       "bottleneck": cfg.bottleneck,
                                       "num_classes": cfg.num_classes,
                                       "width": cfg.width}})
    return params


def load_checkpoint(path):
    blob = load_quantized(path)
    c = blob.get("cfg")
    cfg = (resnet.ResNetConfig(stage_blocks=tuple(c["stage_blocks"]),
                               bottleneck=c["bottleneck"],
                               num_classes=int(c["num_classes"]),
                               width=int(c["width"]))
           if c else resnet.RESNET50)
    scales = {k: jnp.asarray(v, jnp.float32)
              for k, v in blob["act_scales"].items()}
    return blob["qparams"], scales, cfg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None,
                    help="ImageNet-style val tree; absent -> digits fallback")
    ap.add_argument("--checkpoint", default=None,
                    help=".lbq with qparams+act_scales (+cfg); digits "
                         "fallback trains one if the file does not exist")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=None,
                    help="eval resolution (default: 224 imagenet, 32 digits)")
    ap.add_argument("--steps", type=int, default=400,
                    help="digits-fallback QAT steps")
    args = ap.parse_args(argv)

    imagenet = args.data_dir is not None and os.path.isdir(args.data_dir)
    if imagenet:
        hw = args.hw or 224
        if not args.checkpoint:
            ap.error("--checkpoint required with --data-dir (build one via "
                     "models/convert.py + quantize_params + save_quantized)")
        qparams, scales, cfg = load_checkpoint(args.checkpoint)
        data_dir, mean, std = args.data_dir, IMAGENET_MEAN, IMAGENET_STD
        tag, out_name = "imagenet", "imagenet_eval.json"
    else:
        if args.data_dir:
            print(f"--data-dir {args.data_dir} not found; digits fallback",
                  file=sys.stderr)
        hw = args.hw or 32
        cfg = resnet.ResNetConfig(stage_blocks=(1, 1, 1, 1), bottleneck=True,
                                  num_classes=10, width=16)
        data_dir = "/tmp/digits_eval_tree"
        data = build_digits_tree(data_dir, hw=hw)
        ckpt = args.checkpoint or "/tmp/digits_resnet_int8.lbq"
        if not os.path.exists(ckpt):
            print(f"training digits checkpoint -> {ckpt}", flush=True)
            train_digits_checkpoint(ckpt, data, cfg, steps=args.steps)
        qparams, scales, cfg = load_checkpoint(ckpt)
        # digits are already [0,1] grayscale triples: identity normalize
        mean = np.zeros(3, np.float32)
        std = np.ones(3, np.float32)
        tag, out_name = "digits-fallback", "imagenet_eval_digits.json"

    samples, classes = list_image_tree(data_dir)
    print(f"[{tag}] {len(samples)} images, {len(classes)} classes, "
          f"hw={hw}, batch={args.batch}", flush=True)
    top1, n = evaluate_top1(qparams, scales, cfg, samples, hw, args.batch,
                            mean=mean, std=std)
    out = {"dataset": tag, "data_dir": data_dir, "images": n,
           "classes": len(classes), "hw": hw, "batch": args.batch,
           "top1_int8": round(top1, 4),
           "pipeline": "PrefetchLoader(C++ fused normalize+quantize) -> "
                       "prequantized int8 chain (backend=xla)"}
    print(json.dumps(out, indent=1))
    with open(out_name, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
