"""Committed golden FLAC byte fixtures with hardcoded expected PCM.

The fuzz suite (test_flac_fuzz.py) builds streams at runtime from
independent RFC 9639 primitives; these three fixtures freeze such streams
as bytes-on-disk with their PCM spelled out literally, so bit-level format
compliance no longer depends on ANY in-process writer — a regression in
either the decoder or the spec understanding trips against constants.
Coverage: mid/side FIXED+LPC, mono CONSTANT + VERBATIM with wasted bits at
an uncommon (8-bit coded) blocksize, left/side with an escape (raw)
residual partition; all with valid frame CRCs and STREAMINFO MD5 where the
samples fit 16 bits. Reference consumer: ffmpeg via
/root/reference/demucs/audio.py:236-265."""

from pathlib import Path

import numpy as np

from demucs_tpu.flacio import decode_flac

GOLDEN = Path(__file__).parent / "golden"

EXPECTED = {
    "midside_fixed_lpc.flac": np.array(
        [[ 127,  125,  117,  117,  122,  119,  114,  111,  107,  106,  106,  100,
            93,   94,  100,  107,  111,  112,  103,  102,  104,   99,   99,  106,
           109,  117,  114,  110,  106,   95,   85,   85,   87,   89,  102,  109,
           116,  120,  125,  133,  138,  138,  143,  146,  139,  129,  118,   95,
            63,   26,  -13,  -46,  -71,  -92, -118, -135, -150, -170, -192, -206,
          -217, -226, -237, -250],
         [ 113,  112,  107,  110,  113,  117,  111,  112,  110,  106,  107,  105,
            97,   96,   98,  111,  113,  112,  105,  107,  109,  107,  111,  119,
           121,  126,  125,  122,  121,  108,  101,  100,  102,  106,  115,  125,
           133,  136,  138,  140,  143,  144,  144,  145,  140,  131,  118,  100,
            72,   39,   -3,  -37,  -67,  -89, -110, -132, -151, -167, -185, -196,
          -210, -215, -223, -237]], dtype=np.int32),
    "mono_const_verbatim_wasted.flac": np.array(
        [[  -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,
            -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,
            -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,   -77,
            -77,   -77,   -77, -1756, -1156, -1464,  1544,  1604, -1312,  1128,
          -1652,   644,  1696,   596, -1084,  -828,  1612,   112, -1752,   -76,
             64,  1804,  1516,  -184,  -888,   984,  1600,  -568, -1448,  1700,
          -1120,  1408,  1784,  1964,  1100, -1092]], dtype=np.int32),
    "leftside_escape_partition.flac": np.array(
        [[   40,  -210,   308,    78,    45,   268,   281,   770,   828,   984,
            412,   609,  1142,  1058,  1204,   913,   360,   227,   561,   311,
           -231,  -533,  -700,  -747,  -510, -1047, -1096,  -729, -1339,  -751,
           -580,  -566,  -753,  -823,  -990,  -720, -1192,  -885, -1328,  -709,
            -19,  -459,  -313,   167,   289,   447,   840,   212,   212,   212,
            212,   212,   212,   212,   212,   212,   212,   212,   212,   212,
            212,   212,   212,   212,   212,   212,   212,   212,   212,   212,
            212,   212,   212,   212,   212,   212,   212,   212,   212,   212,
            212,   212,   212,   212,   212,   212,   212,   212,   212,   212,
            212,   212,   212,   212,   212,   212],
         [   59,  -136,   364,    72,    28,   207,   297,   720,   844,  1055,
            478,   552,  1155,  1104,  1276,   959,   296,   284,   582,   344,
           -265,  -516,  -714,  -677,  -500, -1053, -1070,  -754, -1264,  -683,
           -604,  -583,  -688,  -834,  -947,  -719, -1265,  -834, -1308,  -755,
              4,  -509,  -343,   162,   326,   401,   862,   144,   243,   277,
            181,   231,   280,   161,   232,   143,   133,   151,   190,   254,
            216,   158,   246,   180,   289,   178,   147,   280,   145,   278,
            136,   216,   216,   279,   198,   259,   246,   278,   160,   274,
            199,   201,   245,   278,   245,   251,   236,   214,   185,   148,
            169,   159,   276,   169,   144,   175]], dtype=np.int32),
}

META = {  # name -> (samplerate, bps)
    "midside_fixed_lpc.flac": (44100, 16),
    "mono_const_verbatim_wasted.flac": (44100, 16),
    "leftside_escape_partition.flac": (44100, 16),
}


def test_golden_flac_fixtures_decode_exactly():
    for name, want in EXPECTED.items():
        data = (GOLDEN / name).read_bytes()
        got, sr, bps = decode_flac(data)
        assert (sr, bps) == META[name], name
        np.testing.assert_array_equal(got, want, err_msg=name)
