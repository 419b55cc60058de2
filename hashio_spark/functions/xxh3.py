"""Pure-Python XXH3 (64- and 128-bit), from the public xxHash
specification (https://github.com/Cyan4973/xxHash — BSD-2; spec in
doc/xxhash_spec.md).  Clean-room re-expression like ``xxh.py``'s XXH64:
the reference wraps the ``xxhash`` C extension
(``/root/reference/lib/hashio/encoder.py:211-228``); this module exists so
xxh3 manifests verify in environments without the extension.

Used by the parity digest registry (``functions/digests.py``) for the
``xxh3_64`` / ``xxh3_128`` algos.  Validated in
``tests/test_digests.py`` against the spec's published sanity values
(empty-input goldens plus XSUM sanity-buffer vectors) and exercised
through the reference's encoder classes via the shim in
``tests/test_reference_parity.py``.
"""

from __future__ import annotations

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF

PRIME32_1 = 0x9E3779B1
PRIME32_2 = 0x85EBCA77
PRIME32_3 = 0xC2B2AE3D
PRIME64_1 = 0x9E3779B185EBCA87
PRIME64_2 = 0xC2B2AE3D27D4EB4F
PRIME64_3 = 0x165667B19E3779F9
PRIME64_4 = 0x85EBCA77C2B2AE63
PRIME64_5 = 0x27D4EB2F165667C5
PRIME_MX1 = 0x165667919E3779F9
PRIME_MX2 = 0x9FB21C651E98DF25

# the 192-byte default secret (kSecret) from the spec
KSECRET = bytes(
    [
        0xB8, 0xFE, 0x6C, 0x39, 0x23, 0xA4, 0x4B, 0xBE, 0x7C, 0x01, 0x81, 0x2C, 0xF7, 0x21, 0xAD, 0x1C,
        0xDE, 0xD4, 0x6D, 0xE9, 0x83, 0x90, 0x97, 0xDB, 0x72, 0x40, 0xA4, 0xA4, 0xB7, 0xB3, 0x67, 0x1F,
        0xCB, 0x79, 0xE6, 0x4E, 0xCC, 0xC0, 0xE5, 0x78, 0x82, 0x5A, 0xD0, 0x7D, 0xCC, 0xFF, 0x72, 0x21,
        0xB8, 0x08, 0x46, 0x74, 0xF7, 0x43, 0x24, 0x8E, 0xE0, 0x35, 0x90, 0xE6, 0x81, 0x3A, 0x26, 0x4C,
        0x3C, 0x28, 0x52, 0xBB, 0x91, 0xC3, 0x00, 0xCB, 0x88, 0xD0, 0x65, 0x8B, 0x1B, 0x53, 0x2E, 0xA3,
        0x71, 0x64, 0x48, 0x97, 0xA2, 0x0D, 0xF9, 0x4E, 0x38, 0x19, 0xEF, 0x46, 0xA9, 0xDE, 0xAC, 0xD8,
        0xA8, 0xFA, 0x76, 0x3F, 0xE3, 0x9C, 0x34, 0x3F, 0xF9, 0xDC, 0xBB, 0xC7, 0xC7, 0x0B, 0x4F, 0x1D,
        0x8A, 0x51, 0xE0, 0x4B, 0xCD, 0xB4, 0x59, 0x31, 0xC8, 0x9F, 0x7E, 0xC9, 0xD9, 0x78, 0x73, 0x64,
        0xEA, 0xC5, 0xAC, 0x83, 0x34, 0xD3, 0xEB, 0xC3, 0xC5, 0x81, 0xA0, 0xFF, 0xFA, 0x13, 0x63, 0xEB,
        0x17, 0x0D, 0xDD, 0x51, 0xB7, 0xF0, 0xDA, 0x49, 0xD3, 0x16, 0x55, 0x26, 0x29, 0xD4, 0x68, 0x9E,
        0x2B, 0x16, 0xBE, 0x58, 0x7D, 0x47, 0xA1, 0xFC, 0x8F, 0xF8, 0xB8, 0xD1, 0x7A, 0xD0, 0x31, 0xCE,
        0x45, 0xCB, 0x3A, 0x8F, 0x95, 0x16, 0x04, 0x28, 0xAF, 0xD7, 0xFB, 0xCA, 0xBB, 0x4B, 0x40, 0x7E,
    ]
)

SECRET_SIZE = len(KSECRET)  # 192
SECRET_LIMIT = SECRET_SIZE - 64  # 128
STRIPES_PER_BLOCK = SECRET_LIMIT // 8  # 16
BLOCK_LEN = 64 * STRIPES_PER_BLOCK  # 1024
MIDSIZE_STARTOFFSET = 3
MIDSIZE_LASTOFFSET = 17


def _r32(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off : off + 4], "little")


def _r64(b: bytes, off: int = 0) -> int:
    return int.from_bytes(b[off : off + 8], "little")


def _swap32(x: int) -> int:
    return int.from_bytes((x & M32).to_bytes(4, "little"), "big")


def _swap64(x: int) -> int:
    return int.from_bytes((x & M64).to_bytes(8, "little"), "big")


def _rotl32(x: int, r: int) -> int:
    x &= M32
    return ((x << r) | (x >> (32 - r))) & M32


def _rotl64(x: int, r: int) -> int:
    x &= M64
    return ((x << r) | (x >> (64 - r))) & M64


def _xorshift64(x: int, shift: int) -> int:
    return (x ^ (x >> shift)) & M64


def _xxh64_avalanche(h: int) -> int:
    h &= M64
    h = ((h ^ (h >> 33)) * PRIME64_2) & M64
    h = ((h ^ (h >> 29)) * PRIME64_3) & M64
    return (h ^ (h >> 32)) & M64


def _xxh3_avalanche(h: int) -> int:
    h = _xorshift64(h & M64, 37)
    h = (h * PRIME_MX1) & M64
    return _xorshift64(h, 32)


def _rrmxmx(h: int, length: int) -> int:
    h &= M64
    h ^= _rotl64(h, 49) ^ _rotl64(h, 24)
    h = (h * PRIME_MX2) & M64
    h ^= ((h >> 35) + length) & M64
    h &= M64
    h = (h * PRIME_MX2) & M64
    return _xorshift64(h, 28)


def _mult64to128(a: int, b: int) -> tuple[int, int]:
    full = (a & M64) * (b & M64)
    return full & M64, (full >> 64) & M64


def _mul128_fold64(a: int, b: int) -> int:
    lo, hi = _mult64to128(a, b)
    return (lo ^ hi) & M64


def _custom_secret(seed: int) -> bytes:
    if seed == 0:
        return KSECRET
    out = bytearray(SECRET_SIZE)
    for i in range(SECRET_SIZE // 16):
        lo = (_r64(KSECRET, 16 * i) + seed) & M64
        hi = (_r64(KSECRET, 16 * i + 8) - seed) & M64
        out[16 * i : 16 * i + 8] = lo.to_bytes(8, "little")
        out[16 * i + 8 : 16 * i + 16] = hi.to_bytes(8, "little")
    return bytes(out)


def _mix16b(inp: bytes, ioff: int, secret: bytes, soff: int, seed: int) -> int:
    input_lo = _r64(inp, ioff)
    input_hi = _r64(inp, ioff + 8)
    return _mul128_fold64(
        input_lo ^ ((_r64(secret, soff) + seed) & M64),
        input_hi ^ ((_r64(secret, soff + 8) - seed) & M64),
    )


# ---------------------------------------------------------------------------
# long-input accumulator core (shared by 64- and 128-bit)
# ---------------------------------------------------------------------------


def _accumulate_512(acc: list[int], inp: bytes, ioff: int, secret: bytes, soff: int) -> None:
    for i in range(8):
        data_val = _r64(inp, ioff + 8 * i)
        data_key = data_val ^ _r64(secret, soff + 8 * i)
        acc[i ^ 1] = (acc[i ^ 1] + data_val) & M64
        acc[i] = (acc[i] + (data_key & M32) * (data_key >> 32)) & M64


def _scramble_acc(acc: list[int], secret: bytes) -> None:
    for i in range(8):
        a = acc[i]
        a ^= a >> 47
        a ^= _r64(secret, SECRET_LIMIT + 8 * i)
        acc[i] = (a * PRIME32_1) & M64


def _hash_long_accs(data: bytes, secret: bytes) -> list[int]:
    acc = [PRIME32_3, PRIME64_1, PRIME64_2, PRIME64_3, PRIME64_4, PRIME32_2, PRIME64_5, PRIME32_1]
    length = len(data)
    nb_blocks = (length - 1) // BLOCK_LEN
    for n in range(nb_blocks):
        base = n * BLOCK_LEN
        for s in range(STRIPES_PER_BLOCK):
            _accumulate_512(acc, data, base + 64 * s, secret, 8 * s)
        _scramble_acc(acc, secret)
    nb_stripes = ((length - 1) - BLOCK_LEN * nb_blocks) // 64
    base = nb_blocks * BLOCK_LEN
    for s in range(nb_stripes):
        _accumulate_512(acc, data, base + 64 * s, secret, 8 * s)
    _accumulate_512(acc, data, length - 64, secret, SECRET_LIMIT - 7)
    return acc


def _merge_accs(acc: list[int], secret: bytes, soff: int, start: int) -> int:
    result = start & M64
    for i in range(4):
        result = (
            result
            + _mul128_fold64(
                acc[2 * i] ^ _r64(secret, soff + 16 * i),
                acc[2 * i + 1] ^ _r64(secret, soff + 16 * i + 8),
            )
        ) & M64
    return _xxh3_avalanche(result)


# ---------------------------------------------------------------------------
# XXH3-64
# ---------------------------------------------------------------------------


def xxh3_64_intdigest(data: bytes, seed: int = 0) -> int:
    length = len(data)
    seed &= M64
    secret = KSECRET
    if length == 0:
        return _xxh64_avalanche(seed ^ _r64(secret, 56) ^ _r64(secret, 64))
    if length <= 3:
        c1, c2, c3 = data[0], data[length >> 1], data[length - 1]
        combined = ((c1 << 16) | (c2 << 24) | c3 | (length << 8)) & M32
        bitflip = ((_r32(secret, 0) ^ _r32(secret, 4)) + seed) & M64
        return _xxh64_avalanche(combined ^ bitflip)
    if length <= 8:
        seed64 = seed ^ ((_swap32(seed & M32) << 32) & M64)
        input1 = _r32(data, 0)
        input2 = _r32(data, length - 4)
        bitflip = ((_r64(secret, 8) ^ _r64(secret, 16)) - seed64) & M64
        input64 = (input2 + (input1 << 32)) & M64
        return _rrmxmx(input64 ^ bitflip, length)
    if length <= 16:
        bitflip1 = ((_r64(secret, 24) ^ _r64(secret, 32)) + seed) & M64
        bitflip2 = ((_r64(secret, 40) ^ _r64(secret, 48)) - seed) & M64
        input_lo = _r64(data, 0) ^ bitflip1
        input_hi = _r64(data, length - 8) ^ bitflip2
        acc = (length + _swap64(input_lo) + input_hi + _mul128_fold64(input_lo, input_hi)) & M64
        return _xxh3_avalanche(acc)
    if length <= 128:
        acc = (length * PRIME64_1) & M64
        if length > 32:
            if length > 64:
                if length > 96:
                    acc = (acc + _mix16b(data, 48, secret, 96, seed)) & M64
                    acc = (acc + _mix16b(data, length - 64, secret, 112, seed)) & M64
                acc = (acc + _mix16b(data, 32, secret, 64, seed)) & M64
                acc = (acc + _mix16b(data, length - 48, secret, 80, seed)) & M64
            acc = (acc + _mix16b(data, 16, secret, 32, seed)) & M64
            acc = (acc + _mix16b(data, length - 32, secret, 48, seed)) & M64
        acc = (acc + _mix16b(data, 0, secret, 0, seed)) & M64
        acc = (acc + _mix16b(data, length - 16, secret, 16, seed)) & M64
        return _xxh3_avalanche(acc)
    if length <= 240:
        acc = (length * PRIME64_1) & M64
        nb_rounds = length // 16
        for i in range(8):
            acc = (acc + _mix16b(data, 16 * i, secret, 16 * i, seed)) & M64
        acc = _xxh3_avalanche(acc)
        for i in range(8, nb_rounds):
            acc = (acc + _mix16b(data, 16 * i, secret, 16 * (i - 8) + MIDSIZE_STARTOFFSET, seed)) & M64
        acc = (acc + _mix16b(data, length - 16, secret, SECRET_LIMIT + 8 - MIDSIZE_LASTOFFSET, seed)) & M64
        return _xxh3_avalanche(acc)
    # long input
    csecret = _custom_secret(seed)
    acc = _hash_long_accs(data, csecret)
    return _merge_accs(acc, csecret, 11, (length * PRIME64_1) & M64)


def xxh3_64_hexdigest(data: bytes, seed: int = 0) -> str:
    return format(xxh3_64_intdigest(data, seed), "016x")


# ---------------------------------------------------------------------------
# XXH3-128
# ---------------------------------------------------------------------------


def _mix32b(
    acc: tuple[int, int], data: bytes, i1: int, i2: int, secret: bytes, soff: int, seed: int
) -> tuple[int, int]:
    lo, hi = acc
    lo = (lo + _mix16b(data, i1, secret, soff, seed)) & M64
    lo ^= (_r64(data, i2) + _r64(data, i2 + 8)) & M64
    hi = (hi + _mix16b(data, i2, secret, soff + 16, seed)) & M64
    hi ^= (_r64(data, i1) + _r64(data, i1 + 8)) & M64
    return lo, hi


def xxh3_128_intdigest(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Returns (low64, high64)."""
    length = len(data)
    seed &= M64
    secret = KSECRET
    if length == 0:
        lo = _xxh64_avalanche(seed ^ _r64(secret, 64) ^ _r64(secret, 72))
        hi = _xxh64_avalanche(seed ^ _r64(secret, 80) ^ _r64(secret, 88))
        return lo, hi
    if length <= 3:
        c1, c2, c3 = data[0], data[length >> 1], data[length - 1]
        combinedl = ((c1 << 16) | (c2 << 24) | c3 | (length << 8)) & M32
        combinedh = _rotl32(_swap32(combinedl), 13)
        bitflipl = ((_r32(secret, 0) ^ _r32(secret, 4)) + seed) & M64
        bitfliph = ((_r32(secret, 8) ^ _r32(secret, 12)) - seed) & M64
        return _xxh64_avalanche(combinedl ^ bitflipl), _xxh64_avalanche(combinedh ^ bitfliph)
    if length <= 8:
        seed64 = seed ^ ((_swap32(seed & M32) << 32) & M64)
        input_lo = _r32(data, 0)
        input_hi = _r32(data, length - 4)
        input64 = (input_lo + (input_hi << 32)) & M64
        bitflip = ((_r64(secret, 16) ^ _r64(secret, 24)) + seed64) & M64
        keyed = input64 ^ bitflip
        lo, hi = _mult64to128(keyed, (PRIME64_1 + (length << 2)) & M64)
        hi = (hi + ((lo << 1) & M64)) & M64
        lo ^= hi >> 3
        lo = _xorshift64(lo, 35)
        lo = (lo * PRIME_MX2) & M64
        lo = _xorshift64(lo, 28)
        hi = _xxh3_avalanche(hi)
        return lo, hi
    if length <= 16:
        bitflipl = ((_r64(secret, 32) ^ _r64(secret, 40)) - seed) & M64
        bitfliph = ((_r64(secret, 48) ^ _r64(secret, 56)) + seed) & M64
        input_lo = _r64(data, 0)
        input_hi = _r64(data, length - 8)
        m_lo, m_hi = _mult64to128(input_lo ^ input_hi ^ bitflipl, PRIME64_1)
        m_lo = (m_lo + ((length - 1) << 54)) & M64
        input_hi ^= bitfliph
        m_hi = (m_hi + input_hi + (input_hi & M32) * (PRIME32_2 - 1)) & M64
        m_lo ^= _swap64(m_hi)
        h_lo, h_hi = _mult64to128(m_lo, PRIME64_2)
        h_hi = (h_hi + m_hi * PRIME64_2) & M64
        return _xxh3_avalanche(h_lo), _xxh3_avalanche(h_hi)
    if length <= 128:
        acc = ((length * PRIME64_1) & M64, 0)
        if length > 32:
            if length > 64:
                if length > 96:
                    acc = _mix32b(acc, data, 48, length - 64, secret, 96, seed)
                acc = _mix32b(acc, data, 32, length - 48, secret, 64, seed)
            acc = _mix32b(acc, data, 16, length - 32, secret, 32, seed)
        acc = _mix32b(acc, data, 0, length - 16, secret, 0, seed)
        lo = (acc[0] + acc[1]) & M64
        hi = (acc[0] * PRIME64_1 + acc[1] * PRIME64_4 + ((length - seed) & M64) * PRIME64_2) & M64
        return _xxh3_avalanche(lo), (0 - _xxh3_avalanche(hi)) & M64
    if length <= 240:
        acc = ((length * PRIME64_1) & M64, 0)
        nb_rounds = length // 32
        for i in range(4):
            acc = _mix32b(acc, data, 32 * i, 32 * i + 16, secret, 32 * i, seed)
        acc = (_xxh3_avalanche(acc[0]), _xxh3_avalanche(acc[1]))
        for i in range(4, nb_rounds):
            acc = _mix32b(acc, data, 32 * i, 32 * i + 16, secret, MIDSIZE_STARTOFFSET + 32 * (i - 4), seed)
        acc = _mix32b(
            acc, data, length - 16, length - 32, secret,
            SECRET_LIMIT + 8 - MIDSIZE_LASTOFFSET - 16, (0 - seed) & M64,
        )
        lo = (acc[0] + acc[1]) & M64
        hi = (acc[0] * PRIME64_1 + acc[1] * PRIME64_4 + ((length - seed) & M64) * PRIME64_2) & M64
        return _xxh3_avalanche(lo), (0 - _xxh3_avalanche(hi)) & M64
    # long input
    csecret = _custom_secret(seed)
    acc = _hash_long_accs(data, csecret)
    lo = _merge_accs(acc, csecret, 11, (length * PRIME64_1) & M64)
    hi = _merge_accs(
        acc, csecret, SECRET_SIZE - 64 - 11, (~(length * PRIME64_2)) & M64
    )
    return lo, hi


def xxh3_128_hexdigest(data: bytes, seed: int = 0) -> str:
    """Canonical (big-endian) representation: high64 then low64."""
    lo, hi = xxh3_128_intdigest(data, seed)
    return format(hi, "016x") + format(lo, "016x")
