"""VP8 (RFC 6386) spec constant tables — GENERATED, do not edit.

Regenerate with scripts/extract_vp8_tables.py (see its docstring
for table provenance and validation).  Shapes:
  AC_QLOOKUP uint16[128]; DC_QLOOKUP uint8[128]; COEFF_BANDS[16];
  COEFF_UPDATE_PROBS / COEFF_DEFAULT_PROBS [4][8][3][11];
  KF_BMODE_PROBS [10][10][9].
"""

import base64
import struct

_AC_QLOOKUP = base64.b64decode(
    "BAAFAAYABwAIAAkACgALAAwADQAOAA8AEAARABIAEwAUABUAFgAXABgAGQAaABsAHAAd"
    "AB4AHwAgACEAIgAjACQAJQAmACcAKAApACoAKwAsAC0ALgAvADAAMQAyADMANAA1ADYA"
    "NwA4ADkAOgA8AD4AQABCAEQARgBIAEoATABOAFAAUgBUAFYAWABaAFwAXgBgAGIAZABm"
    "AGgAagBsAG4AcAByAHQAdwB6AH0AgACDAIYAiQCMAI8AkgCVAJgAmwCeAKEApACnAKoA"
    "rQCxALUAuQC9AMEAxQDJAM0A0QDVANkA3QDhAOUA6gDvAPUA+QD+AAMBCAENARIBFwEc"
    "AQ=="
)
_DC_QLOOKUP = base64.b64decode(
    "BAUGBwgJCgoLDA0ODxARERITFBQVFRYWFxcYGRkaGxwdHh8gISIjJCUlJicoKSorLC0u"
    "Li8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdISUpLTExNTk9QUVJTVFVWV1hZW11fYGJk"
    "ZWZoamxucHJ0dnp8foCChIaIioyPkZSXmp0="
)
_COEFF_BANDS = base64.b64decode(
    "AAECAwYEBQYGBgYGBgYGBw=="
)
_COEFF_UPDATE_PROBS = base64.b64decode(
    "////////////////////////////////////////////sPb////////////f8fz/////"
    "//////n9/f////////////T8///////////q/v7///////////3///////////////b+"
    "///////////v/f7///////////7//v////////////j+///////////7//7/////////"
    "//////////////////3+///////////7/v7///////////7//v////////////79//7/"
    "///////6//7//v////////7/////////////////////////////////////////////"
    "////////////2f/////////////h/PH9///+/////+r68fr9//3+//////7/////////"
    "///f/v7//////////+79/v7///////////j+///////////5/v//////////////////"
    "//////////3////////////3/v////////////////////////////3+///////////8"
    "//////////////////////////////7+///////////9////////////////////////"
    "//////79///////////6//////////////7/////////////////////////////////"
    "////////////////////////uvv6///////////q+/T+//////////v78/3+//7/////"
    "//3+///////////s/f7///////////v9/f7+//////////7+///////////+/v7/////"
    "//////////////////////7////////////+/v////////////7/////////////////"
    "///////////+////////////////////////////////////////////////////////"
    "////////////////////////////////////////////////////////////////////"
    "////////////////////////////////////+P/////////////6/vz+//////////j+"
    "+f3///////////39///////////2/f3///////////z++/7+//////////78////////"
    "///4/v3///////////3//v7///////////v+///////////1+/7///////////39/v//"
    "//////////v9///////////8/f7////////////+//////////////z////////////5"
    "//7//////////////v/////////////9///////////6////////////////////////"
    "///////////////////+////////////////////////////"
)
_KF_BMODE_PROBS = base64.b64decode(
    "53gwWXNxeJhwmLNAfqp2LkZfr0WPUFVSSJtnODoKq9q9EQ2YkEcKJqvVkCIachoRoyzD"
    "FQqteRhQwxo+LEBVqi43E4igIc5HPxQIcnLQDAniUSgLYLZUHRAkhrdZiWJlaqWUSLtk"
    "gp1vIEtQQmanY0o+KOqAKTUJsvGNGghraE8MG9n/VxEHSisakkmmMRedQSZpoDM0H3OA"
    "V0RHLHIzD7oXLykObra3FRHCQi0ZZsW9FxIWWFiTliouLcTNK2G3dVUmI7M9JzXIVxoV"
    "K+irOCIzaHJmHV1NazYgGjMBUSsfJxxVqzqlWmJAIhZ0zhciK6ZJRBlqFkCrJOFyIhMV"
    "ZoS8EEx8PhJOX1U5MjAzwWUjn9dvWS5vPJQfrNvkFRJvcHFNVbP/JnhyKCoBxPXRChlt"
    "ZFAIK5oBMxpHWCsdjKbVJSuaPT8em0MtRAHRjk5OEP+AIsWrKSgFZtO3BAHdMzIRqNHA"
    "FxlSfWIqWGhVda9SX1Q1WYBkcWUtS097LzOAUasBOREFR2Y5NSkxcxUCCmb/phcGJiEN"
    "eTlJGgFVKQpDik1uWi9yZR0QClWAZcQaORIKZmbVIhQrdRQPJKOARAEaih8kqxumJizl"
    "Q1c6qVJzGjuzPztatDumXUmaKCgVdI/RIievOS4WGIABNhElLw8QtyLfMS23LhEhtwZi"
    "DyC3QSBJcxyAF4DNKAMJczPAEgbfVyUJcztNQBUvaDcs2gk2NYLiQFpGzSgpFxo5Njlw"
    "uAUpJqbVHiIahZh0CiCGSyAMM8D/oCszJxM13RpyIEn/HwlB6gIPAXZJWB8jQ2ZVN7pV"
    "OBUXbzvNLSXANyZGfElmASJiZj1HJSI1H/PARTxHJkl3HN4lRC2AIgEvC/WrPhETRpJV"
    "Nz5GSw8JCUD/uHcQJSslmmSjVaABPwlciBxAIMlVVgYcBUD/GfgBOAgRhIn/N3SAOg8U"
    "Uoc5GnkopDIfiZqFGSPaM2csg4N7HwaeVihAh5TgLbeAFhoRg/CaDgHRUwwNNsD/RC8c"
    "LRAVW0DeBwHFOBUnmzyKF2bVVRpVVYCAIJKrEgsHP5CrBAT2IxsKkq6rDBqAvlAjY7RQ"
    "fjYtVX4vV7AzKRQgZUuAi3aSdIBVOCkPsOxVJQk+kiQTHqv/YRsURx4Rd3b/ERKKZSY8"
    "ijdGKxqOii09PtsBUbxAICkUdZeOFBWjcBMMPcOAMAQY"
)
_COEFF_DEFAULT_PROBS = base64.b64decode(
    "gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICA/Yj+/+TbgICAgIC9gfL/49X/"
    "24CAgGp+4/zW0f//gICAAWL4/+zi//+AgIC1he7+3er/moCAgE6GyvfGtP/bgICAAbn5"
    "//P/gICAgIC4lvf/7OCAgICAgE1u2P/s5oCAgICAAWX7//H/gICAgICqi/H87NH//4CA"
    "gCV0xPPk////gICAAcz+//X/gICAgIDPoPr/7oCAgICAgGZn5//Tq4CAgICAAZj8//D/"
    "gICAgICxh/P/6uGAgICAgFCB0//C4ICAgICAAQH/gICAgICAgID2Af+AgICAgICAgP+A"
    "gICAgICAgICAxiPt38G7oqCRmz6DLcbdrLDcnfzdAUQvktCVp92i/9+AAZXx/93g//+A"
    "gIC4jer93tz/x4CAgFFjtfKwvvnK//+AAYHo/dbF8sT//4BjedL6ycb/yoCAgBdbo/Kq"
    "u/fS//+AAcj2/+r/gICAgIBtsvH/5/X//4CAgCyCyf3NwP//gICAAYTv+9vR/6WAgIBe"
    "iOH72r7//4CAgBZkrvW6of/HgICAAbb5/+jrgICAgIB8j/H/4+qAgICAgCNNtfvB0//N"
    "gICAAZ33/+zn//+AgIB5jev/4eP//4CAgC1jvPvD2f/ggICAAQH7/9X/gICAgIDLAfj/"
    "/4CAgICAgIkBsf/g/4CAgICA/Qn4+8/Q/8CAgICvDeDzwbn5xv//gEkRq92hs+yn/+qA"
    "AV/3/dS3//+AgIDvWvT609H//4CAgJtNw/i8w///gICAARjv+9rb/82AgIDJM9v/xLqA"
    "gICAgEUuvu/J2v/kgICAAb/7//+AgICAgIDfpfn/1f+AgICAgI18+P//gICAgICAARD4"
    "//+AgICAgIC+JOb/7P+AgICAgJUB/4CAgICAgICAAeL/gICAgICAgID3wP+AgICAgICA"
    "gPCA/4CAgICAgICAAYb8//+AgICAgIDVPvr//4CAgICAgDdd/4CAgICAgICAgICAgICA"
    "gICAgICAgICAgICAgICAgICAgICAgICAgICAyhjV67q/3KDwr/9+Jrboqbjkrv+7gD0u"
    "ituXsvCq/9iAAXDm+se/95///4CmbeT809f/roCAgCdNouistPWy//+AATTc9sbH+dz/"
    "/4B8Sr/zt8H63f//gBhHgtuaqvO2//+AAbbh+dvw/+CAgICVluL82M3/q4CAgBxsqvK3"
    "wv7f//+AAVHm/MzL/8CAgIB7ZtH3vMT/6YCAgBRfmfOkrf/LgICAAd74/9jVgICAgICo"
    "r/b8683//4CAgC901//T1P//gICAAXns/dTW//+AgICNVNX8ycr/24CAgCpQoPCiuf/N"
    "gICAAQH/gICAgICAgID0Af+AgICAgICAgO4B/4CAgICAgICA"
)

AC_QLOOKUP = list(struct.unpack("<128H", _AC_QLOOKUP))
DC_QLOOKUP = list(_DC_QLOOKUP)
COEFF_BANDS = list(_COEFF_BANDS)


def _cube(raw):
    return [
        [
            [list(raw[t * 264 + b * 33 + c * 11 : t * 264 + b * 33 + c * 11 + 11]) for c in range(3)]
            for b in range(8)
        ]
        for t in range(4)
    ]


COEFF_UPDATE_PROBS = _cube(_COEFF_UPDATE_PROBS)
COEFF_DEFAULT_PROBS = _cube(_COEFF_DEFAULT_PROBS)
KF_BMODE_PROBS = [
    [list(_KF_BMODE_PROBS[a * 90 + l * 9 : a * 90 + l * 9 + 9]) for l in range(10)]
    for a in range(10)
]
