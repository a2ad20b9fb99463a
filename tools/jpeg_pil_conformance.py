#!/usr/bin/env python3
"""One-file conformance harness for the PIL/libjpeg JPEG decode arm.

r8 verdict ask #5: Pillow is not installable in the build sandbox, so
``tests/test_multimodal.py::test_jpeg_roundtrip_pil_backend_matches_pure``
skips there and the production (PIL) backend of ``decode_jpeg_gray``
has never executed in-sandbox.  This harness is the committed,
environment-portable half of that evidence: run it on ANY machine with
Pillow and it certifies the PIL arm against the same contracts the
pure kernel is pinned to.  Without Pillow it still verifies the pure
kernel against the committed goldens (mode it runs in CI here).

Checks, per golden frame (deterministic pixels, encoded by our own
baseline T.81 encoder at quality 100):
  1. the encoded bytes hash to the committed sha256 (encoder drift
     cannot silently re-baseline the goldens);
  2. the pure decode reproduces the committed (w, h, mean/min/max);
  3. [PIL present] the PIL decode matches pure within the T.83
     integer-IDCT band (<= 1.0 per pixel), EXACTLY for flat/DC-only
     frames, with identical dimensions;
  4. [PIL present] non-JPEG magic raises UnsupportedMediaError from
     BOTH backends (the r9 SOI check: PIL must not sniff PNG/GIF).

Exit 0 on pass; prints one JSON line.  Usage:
    python tools/jpeg_pil_conformance.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgloader_spark.operators import multimodal as mm  # noqa: E402

# (name, frame builder, sha256[:16] of encode_jpeg_gray8(q=100),
#  w, h, mean, min, max, flat?) — stats from the pure decoder,
# committed r9 (regenerate deliberately if the encoder changes).
GOLDENS = [
    ("flat77_16x16", lambda: [[77] * 16] * 16,
     "dacd3aff8b5dbad8", 16, 16, 77.0, 77.0, 77.0, True),
    ("gradient_24x16",
     lambda: [[(x * 7 + y * 3) % 256 for x in range(24)] for y in range(16)],
     "cb324593d296e925", 24, 16, 103.000378, 0.0, 206.144999658691, False),
    ("blocks_32x24",
     lambda: [[(31 * (xx // 8) + 17 * (yy // 8) * 4) % 256
               for xx in range(32)] for yy in range(24)],
     "cc8ef122bc4a491b", 32, 24, 114.5, 0.0, 229.0, True),
    ("stripes_40x8",
     lambda: [[255 if (x // 4) % 2 == 0 else 0 for x in range(40)]
              for y in range(8)],
     "ff85532f6f4f6037", 40, 8, 127.5, 0.0, 255.0, False),
]


def main() -> int:
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    import numpy as np

    failures: list[str] = []
    for name, build, sha, w, h, mean, mn, mx, flat in GOLDENS:
        data = mm.encode_jpeg_gray8(build(), quality=100)
        got_sha = hashlib.sha256(data).hexdigest()[:16]
        if got_sha != sha:
            failures.append(f"{name}: encoder drift {got_sha} != {sha}")
            continue
        wp, hp, pure = mm._decode_jpeg_gray_pure(data)
        m = np.array(pure)
        stats = (wp, hp, round(float(m.mean()), 6),
                 float(m.min()), round(float(m.max()), 12))
        want = (w, h, mean, mn, round(mx, 12))
        if stats != want:
            failures.append(f"{name}: pure stats {stats} != {want}")
        if not has_pil:
            continue
        wl, hl, pil = mm._decode_jpeg_gray_pil(data)
        p = np.array(pil)
        if (wl, hl) != (wp, hp):
            failures.append(f"{name}: PIL dims {(wl, hl)} != {(wp, hp)}")
        band = float(np.abs(m - p).max())
        if flat and band != 0.0:
            failures.append(f"{name}: flat frame not bit-exact (max {band})")
        elif band > 1.0:
            failures.append(f"{name}: outside T.83 band (max {band})")
    if has_pil:
        for magic in (b"\x89PNG\r\n\x1a\n" + b"x" * 32,
                      b"GIF89a" + b"x" * 32, b"junkbytes" * 8):
            try:
                mm._decode_jpeg_gray_pil(magic)
                failures.append("PIL arm accepted non-JPEG magic")
            except mm.UnsupportedMediaError:
                pass
    print(json.dumps({
        "harness": "jpeg_pil_conformance",
        "pil_present": has_pil,
        "pil_version": getattr(__import__("PIL"), "__version__", None)
        if has_pil else None,
        "frames": len(GOLDENS),
        "failures": failures,
        "verdict": "PASS" if not failures else "FAIL",
        "scope": "pure-kernel goldens only" if not has_pil
        else "pure + PIL cross-backend",
    }))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
