#!/usr/bin/env python3
"""Dual-transcription cross-check for the cityHash64 / murmurHash2_64
kernels (the two round-10 hashes with NO independent implementation in
this sandbox — farmFingerprint64/murmurHash3 are Guava-cross-validated
instead, see ChDialectSpec).

This file is a SECOND, from-scratch transcription of the published
algorithms (CityHash v1.0.2, Pike & Alakuijala 2011; MurmurHash64A,
Appleby) in a different language from the production kernel
(`functions/CHValues.scala`). It recomputes the b_fnh4 oracle's golden
vectors and the spec's structural pins; a transcription slip in either
copy fails the check. Run: python3 scripts/cityhash102_selfcheck.py
"""
M64 = (1 << 64) - 1

K0 = 0xC3A5C85C97CB3127
K1 = 0xB492B66FBE98F273
K2 = 0x9AE16A3B2F90404F
K3 = 0xC949D7C7509E6557
KMUL = 0x9DDFEA08EB382D69


def f64(b, i):
    return int.from_bytes(b[i:i + 8], "little")


def f32(b, i):
    return int.from_bytes(b[i:i + 4], "little")


def rotr(v, s):
    s %= 64
    if s == 0:
        return v & M64
    return ((v >> s) | (v << (64 - s))) & M64


def shiftmix(v):
    return (v ^ (v >> 47)) & M64


def hash128to64(lo, hi):
    a = ((lo ^ hi) * KMUL) & M64
    a ^= a >> 47
    b = ((hi ^ a) * KMUL) & M64
    b ^= b >> 47
    return (b * KMUL) & M64


def hashlen16(u, v):
    return hash128to64(u, v)


def hashlen0to16(s):
    n = len(s)
    if n > 8:
        a = f64(s, 0)
        b = f64(s, n - 8)
        return (hashlen16(a, rotr((b + n) & M64, n)) ^ b) & M64
    if n >= 4:
        a = f32(s, 0)
        return hashlen16((n + (a << 3)) & M64, f32(s, n - 4))
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & M64
        z = (n + (c << 2)) & M64
        return (shiftmix((y * K2 ^ z * K3) & M64) * K2) & M64
    return K2


def hashlen17to32(s):
    n = len(s)
    a = (f64(s, 0) * K1) & M64
    b = f64(s, 8)
    c = (f64(s, n - 8) * K2) & M64
    d = (f64(s, n - 16) * K0) & M64
    return hashlen16(
        (rotr((a - b) & M64, 43) + rotr(c, 30) + d) & M64,
        (a + rotr((b ^ K3) & M64, 20) - c + n) & M64)


def hashlen33to64(s):
    n = len(s)
    z = f64(s, 24)
    a = (f64(s, 0) + (n + f64(s, n - 16)) * K0) & M64
    b = rotr((a + z) & M64, 52)
    c = rotr(a, 37)
    a = (a + f64(s, 8)) & M64
    c = (c + rotr(a, 7)) & M64
    a = (a + f64(s, 16)) & M64
    vf = (a + z) & M64
    vs = (b + rotr(a, 31) + c) & M64
    a = (f64(s, 16) + f64(s, n - 32)) & M64
    z = f64(s, n - 8)
    b = rotr((a + z) & M64, 52)
    c = rotr(a, 37)
    a = (a + f64(s, n - 24)) & M64
    c = (c + rotr(a, 7)) & M64
    a = (a + f64(s, n - 16)) & M64
    wf = (a + z) & M64
    ws = (b + rotr(a, 31) + c) & M64
    r = shiftmix(((vf + ws) * K2 + (wf + vs) * K0) & M64)
    return (shiftmix((r * K0 + vs) & M64) * K2) & M64


def weak32(s, off, a, b):
    w, x, y, z = f64(s, off), f64(s, off + 8), f64(s, off + 16), f64(s, off + 24)
    a = (a + w) & M64
    b = rotr((b + a + z) & M64, 21)
    c = a
    a = (a + x + y) & M64
    b = (b + rotr(a, 44)) & M64
    return (a + z) & M64, (b + c) & M64


def cityhash64(s):
    n = len(s)
    if n <= 16:
        return hashlen0to16(s)
    if n <= 32:
        return hashlen17to32(s)
    if n <= 64:
        return hashlen33to64(s)
    x = f64(s, 0)
    y = (f64(s, n - 16) ^ K1) & M64
    z = (f64(s, n - 56) ^ K0) & M64
    v = weak32(s, n - 64, n, y)
    w = weak32(s, n - 32, (n * K1) & M64, K0)
    z = (z + shiftmix(v[1]) * K1) & M64
    x = (rotr((z + x) & M64, 39) * K1) & M64
    y = (rotr(y, 33) * K1) & M64
    rem = (n - 1) & ~63
    off = 0
    while True:
        x = (rotr((x + y + v[0] + f64(s, off + 16)) & M64, 37) * K1) & M64
        y = (rotr((y + v[1] + f64(s, off + 48)) & M64, 42) * K1) & M64
        x ^= w[1]
        y ^= v[0]
        z = rotr((z ^ w[0]) & M64, 33)
        v = weak32(s, off, (v[1] * K1) & M64, (x + w[0]) & M64)
        w = weak32(s, off + 32, (z + w[1]) & M64, y)
        z, x = x, z
        off += 64
        rem -= 64
        if rem == 0:
            break
    return hashlen16(
        (hashlen16(v[0], w[0]) + shiftmix(y) * K1 + z) & M64,
        (hashlen16(v[1], w[1]) + x) & M64)


def murmur2_64(s, seed=0):
    m = 0xC6A4A7935BD1E995
    r = 47
    n = len(s)
    h = (seed ^ (n * m)) & M64
    full = n - (n % 8)
    for i in range(0, full, 8):
        k = f64(s, i)
        k = (k * m) & M64
        k ^= k >> r
        k = (k * m) & M64
        h ^= k
        h = (h * m) & M64
    tail = s[full:]
    if tail:
        for j in range(len(tail) - 1, -1, -1):
            h ^= tail[j] << (8 * j)
        h = (h * m) & M64
    h ^= h >> r
    h = (h * m) & M64
    h ^= h >> r
    return h


# ---- the b_fnh4 goldens (Functions.scala) + spec pins, recomputed ----
GOLDEN_CITY = {
    0: 4473359914463220727, 1: 6252444007478766661,
    2: 13295349409837935334, 3: 17449523772470675439,
    4: 16428975465549811263, 5: 5200343875559146976,
    6: 5183137872438093812, 7: 18425937707050688089,
}
GOLDEN_MM2 = {
    0: 7019289059763183720, 1: 12131811513065963324,
    2: 8664671578182088841, 3: 8482483021015396222,
    4: 17424539168323206691, 5: 13145155397273927316,
    6: 16260145770195834352, 7: 10584991537798977811,
}

if __name__ == "__main__":
    assert cityhash64(b"") == K2, "len-0 algebraic pin"
    assert murmur2_64(b"") == 0, "murmur2 len-0 pin"
    for m in range(8):
        s = f"graft-{m}".encode()
        assert cityhash64(s) == GOLDEN_CITY[m], f"cityHash64 golden {m}"
        assert murmur2_64(s) == GOLDEN_MM2[m], f"murmurHash2_64 golden {m}"
    long48 = ("graft-" * 20)[:48].encode()
    long100 = ("graft-" * 20)[:100].encode()
    assert cityhash64(long48) == 13143209125338545875, "33..64 branch golden"
    assert cityhash64(long100) != cityhash64(long48)
    # 64+ loop branch: values cross-checked against the Scala kernel
    # (both transcriptions agree — frozen here so either side's drift
    # fails), plus sensitivity/determinism across the loop boundary
    b65 = bytes((i * 131 + 7) % 256 for i in range(65))
    b1000 = bytes((i * 131 + 7) % 256 for i in range(1000))
    assert cityhash64(b65) == 2740400107408553708, "64+ loop, len 65"
    assert cityhash64(long100) == 7184027177546714740, "64+ loop, len 100"
    assert cityhash64(b1000) == 18283735067913792104, "64+ loop, len 1000"
    assert murmur2_64(b1000) == 15933389379890392334, "murmur2 multi-block"
    for n in (65, 127, 128, 129, 1000):
        b = bytes((i * 131 + 7) % 256 for i in range(n))
        h = cityhash64(b)
        assert h == cityhash64(bytes(b)), "determinism"
        flip = bytearray(b)
        flip[n // 2] ^= 1
        assert cityhash64(bytes(flip)) != h, f"sensitivity at len={n}"
    print("cityhash102 selfcheck: all dual-transcription checks green")
