"""Reference series fixtures — public R `datasets` values (FIXTURES.md §2).

These are the series the reference testthat suite drives its golden-value
tests with (tests/testthat/test-features.R, test-stl.R). Embedded verbatim;
the golden assertions themselves double-check the embedding (a wrong value
breaks n_crossing_points / guerrero etc. immediately).
"""

import numpy as np

# P.J. Diggle (1990) — internet usage per minute, n=100, period 1
WWWUSAGE = np.array([
    88, 84, 85, 85, 84, 85, 83, 85, 88, 89, 91, 99, 104, 112, 126, 138, 146,
    151, 150, 148, 147, 149, 143, 132, 131, 139, 147, 150, 148, 145, 140,
    134, 131, 131, 129, 126, 126, 132, 137, 140, 142, 150, 159, 167, 170,
    171, 172, 172, 174, 175, 172, 172, 174, 174, 169, 165, 156, 142, 131,
    121, 112, 104, 102, 99, 99, 95, 88, 84, 84, 87, 89, 88, 85, 86, 89, 91,
    91, 94, 101, 110, 121, 135, 145, 149, 156, 165, 171, 175, 177, 182, 193,
    204, 208, 210, 215, 222, 228, 226, 222, 220,
], dtype=np.float64)

# US accidental deaths, monthly 1973-1978, n=72, period 12
USACCDEATHS = np.array([
    9007, 8106, 8928, 9137, 10017, 10826, 11317, 10744, 9713, 9938, 9161,
    8927, 7750, 6981, 8038, 8422, 8714, 9512, 10120, 9823, 8743, 9129, 8710,
    8680, 8162, 7306, 8124, 7870, 9387, 9556, 10093, 9620, 8285, 8466, 8160,
    8034, 7717, 7461, 7767, 7925, 8623, 8945, 10078, 9179, 8037, 8488, 7874,
    8647, 7792, 6957, 7726, 8106, 8890, 9299, 10625, 9302, 8314, 8850, 8265,
    8796, 7836, 6892, 7791, 8192, 9115, 9434, 10484, 9827, 9110, 9070, 8633,
    9240,
], dtype=np.float64)

# UK lung disease deaths (males), monthly 1974-1979, n=72, period 12
MDEATHS = np.array([
    2134, 1863, 1877, 1877, 1492, 1249, 1280, 1131, 1209, 1492, 1621, 1846,
    2103, 2137, 2153, 1833, 1403, 1288, 1186, 1133, 1053, 1347, 1545, 2066,
    2020, 2750, 2283, 1479, 1189, 1160, 1113, 970, 999, 1208, 1467, 2059,
    2240, 1634, 1722, 1801, 1246, 1162, 1087, 1013, 959, 1179, 1229, 1655,
    2019, 2284, 1942, 1423, 1340, 1187, 1098, 1004, 970, 1140, 1110, 1812,
    2263, 1820, 1846, 1531, 1215, 1075, 1056, 975, 940, 1081, 1294, 1341,
], dtype=np.float64)

# UK lung disease deaths (females), monthly 1974-1979, n=72, period 12
FDEATHS = np.array([
    901, 689, 827, 677, 522, 406, 441, 393, 387, 582, 578, 666, 830, 752,
    785, 664, 467, 438, 421, 412, 343, 440, 531, 771, 767, 1141, 896, 532,
    447, 420, 376, 330, 357, 445, 546, 764, 862, 660, 663, 643, 502, 392,
    411, 348, 387, 385, 411, 638, 796, 853, 737, 546, 530, 446, 431, 362,
    387, 430, 425, 679, 821, 785, 727, 612, 478, 429, 405, 379, 393, 411,
    487, 574,
], dtype=np.float64)

# synthetic multi-seasonal series from test-stl.R:47-80
SYNTHETIC_MS = (
    np.tile(np.arange(1, 5), 25)[:100] + np.resize(np.arange(1, 8), 100)
).astype(np.float64)

SERIES = {
    "WWWusage": (WWWUSAGE, 1),
    "USAccDeaths": (USACCDEATHS, 12),
    "mdeaths": (MDEATHS, 12),
    "fdeaths": (FDEATHS, 12),
}
