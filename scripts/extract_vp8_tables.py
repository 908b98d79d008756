"""Regenerate pr2_transformation_spark/reference_data/vp8_tables.py.

The VP8 keyframe decoder (RFC 6386) needs five constant tables published
in the spec itself — default token probabilities (§13.5), token-probability
update probabilities (§13.4), keyframe 4x4 intra-mode probabilities
(§11.5), and the two quantizer lookup tables (§14.1).  They total ~3.4 KB
of public spec data; typing them by hand invites silent transpositions a
round-trip test cannot catch (encoder and decoder would share the typo).

This script instead lifts them from the system libwebp shared library
(BSD-licensed reference implementation of the same RFC), locating each by
a short spec-known anchor and validating its structure:

  kAcTable          uint16[128]        ac_qlookup, 4..284
  kDcTable          uint8[128]         dc_qlookup, 4..157
  kBands            uint8[16]          coefficient position -> band
  CoeffsUpdateProba [4][8][3][11]      values in {254, 255}
  kf_bmode_prob     [10][10][9]        keyframe B_PRED mode probs
  CoeffsProba0      [4][8][3][11]      default token probs; type-0 band-0
                                       is the spec's all-128 placeholder
                                       (type 0 starts at coefficient 1)

The generated module is committed, so the engine never needs libwebp at
runtime; the library (plus `tests/test_vp8_conformance.py`, which uses it
as an independent decode reference via ctypes) is only needed to
regenerate or re-verify.

Usage: python scripts/extract_vp8_tables.py [path-to-libwebp.so]
"""

from __future__ import annotations

import base64
import glob
import struct
import sys


def _find(data: bytes, pat: bytes, what: str) -> int:
    i = data.find(pat)
    if i < 0:
        raise SystemExit(f"anchor for {what} not found in library")
    return i


def main() -> None:
    candidates = sys.argv[1:] or sorted(
        glob.glob("/usr/lib/*/libwebp.so*") + glob.glob("/usr/lib/libwebp.so*")
    )
    if not candidates:
        raise SystemExit("no libwebp shared library found")
    data = open(candidates[-1], "rb").read()

    # ac_qlookup: uint16 ascending 4,5,6,7,8,9,10,11 then dc_qlookup
    # (uint8) and the position->band map follow contiguously.
    ac_off = _find(data, struct.pack("<8H", 4, 5, 6, 7, 8, 9, 10, 11), "ac_qlookup")
    ac = list(struct.unpack_from("<128H", data, ac_off))
    assert ac[-1] == 284 and all(a <= b for a, b in zip(ac, ac[1:])), ac[-8:]
    dc = list(data[ac_off + 256 : ac_off + 256 + 128])
    assert dc[:8] == [4, 5, 6, 7, 8, 9, 10, 10] and dc[-1] == 157, dc[:8]
    bands = list(data[ac_off + 384 : ac_off + 384 + 16])
    assert bands == [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7], bands

    # keyframe bmode probs: anchored by the spec's [B_DC][B_DC] row.
    # libwebp numbers the diagonal modes differently from the RFC
    # (B_RD=4, B_VR=5, B_LD=6 vs the RFC's B_LD=4, B_RD=5, B_VR=6), so
    # permute both context dimensions into RFC order — found the hard
    # way: un-permuted rows decode the wrong submode the moment a
    # diagonal mode becomes a neighbor context.
    kb_off = _find(data, bytes([231, 120, 48, 89, 115, 113, 120, 152, 112]),
                   "kf_bmode_prob")
    raw = data[kb_off : kb_off + 900]
    assert min(raw) >= 1, "probability 0 is invalid"
    perm = [0, 1, 2, 3, 6, 4, 5, 7, 8, 9]  # RFC index -> libwebp index
    kf_bmode = bytes(
        raw[perm[a] * 90 + perm[l] * 9 + p]
        for a in range(10) for l in range(10) for p in range(9)
    )

    # default token probs: anchored by the spec's [0][1][0] row; the table
    # STARTS 33 bytes earlier (type-0 band-0 = 3 all-128 placeholder rows).
    cp_anchor = _find(data, bytes([253, 136, 254, 255, 228, 219, 128]),
                      "CoeffsProba0")
    cp_off = cp_anchor - 33
    coeffs = data[cp_off : cp_off + 1056]
    assert coeffs[:33] == bytes([128] * 33), "type-0 band-0 placeholder"
    assert min(coeffs) >= 1, "probability 0 is invalid"

    # update probs: the 1056 bytes immediately before kf_bmode — strongly
    # 255-dominated (an update is rare for most positions) but with real
    # sub-255 entries in the low bands.
    up = data[kb_off - 1056 : kb_off]
    assert min(up) >= 1 and up.count(255) > 700, (min(up), up.count(255))

    blob = {
        "AC_QLOOKUP": base64.b64encode(struct.pack("<128H", *ac)).decode(),
        "DC_QLOOKUP": base64.b64encode(bytes(dc)).decode(),
        "COEFF_BANDS": base64.b64encode(bytes(bands)).decode(),
        "COEFF_UPDATE_PROBS": base64.b64encode(up).decode(),
        "KF_BMODE_PROBS": base64.b64encode(kf_bmode).decode(),
        "COEFF_DEFAULT_PROBS": base64.b64encode(coeffs).decode(),
    }
    out = [
        '"""VP8 (RFC 6386) spec constant tables — GENERATED, do not edit.',
        "",
        "Regenerate with scripts/extract_vp8_tables.py (see its docstring",
        "for table provenance and validation).  Shapes:",
        "  AC_QLOOKUP uint16[128]; DC_QLOOKUP uint8[128]; COEFF_BANDS[16];",
        "  COEFF_UPDATE_PROBS / COEFF_DEFAULT_PROBS [4][8][3][11];",
        "  KF_BMODE_PROBS [10][10][9].",
        '"""',
        "",
        "import base64",
        "import struct",
        "",
    ]
    for name, b64 in blob.items():
        out.append(f"_{name} = base64.b64decode(")
        for i in range(0, len(b64), 68):
            out.append(f'    "{b64[i:i + 68]}"')
        out.append(")")
    out += [
        "",
        'AC_QLOOKUP = list(struct.unpack("<128H", _AC_QLOOKUP))',
        "DC_QLOOKUP = list(_DC_QLOOKUP)",
        "COEFF_BANDS = list(_COEFF_BANDS)",
        "",
        "",
        "def _cube(raw):",
        "    return [",
        "        [",
        "            [list(raw[t * 264 + b * 33 + c * 11 :"
        " t * 264 + b * 33 + c * 11 + 11]) for c in range(3)]",
        "            for b in range(8)",
        "        ]",
        "        for t in range(4)",
        "    ]",
        "",
        "",
        "COEFF_UPDATE_PROBS = _cube(_COEFF_UPDATE_PROBS)",
        "COEFF_DEFAULT_PROBS = _cube(_COEFF_DEFAULT_PROBS)",
        "KF_BMODE_PROBS = [",
        "    [list(_KF_BMODE_PROBS[a * 90 + l * 9 : a * 90 + l * 9 + 9])"
        " for l in range(10)]",
        "    for a in range(10)",
        "]",
        "",
    ]
    path = "pr2_transformation_spark/reference_data/vp8_tables.py"
    open(path, "w").write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
