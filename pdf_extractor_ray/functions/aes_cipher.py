"""AES block cipher (FIPS 197) in pure numpy, plus the CBC modes the
PDF standard security handler needs (ISO 32000-1 §7.6.2 AESV2, ISO
32000-2 §7.6.4 AESV3).

Public-knowledge implementation discipline (same as the RFC 1321 MD5
in ops/scrub.py): every table is GENERATED from the published field
arithmetic rather than typed in — the S-box is the affine transform of
the GF(2^8) multiplicative inverse (FIPS 197 §5.1.1), the MixColumns
tables come from GF multiplication by the spec's fixed polynomials
(§5.1.3/§5.3.3), Rcon is the powers of x in GF(2^8) (§5.2) — and the
whole cipher is pinned to the FIPS 197 Appendix C known-answer vectors
in tests/test_pdf_codec.py.

Block operations are vectorized over ALL blocks of a payload at once
(shape (n_blocks, 16) uint8): CBC *decryption* is data-parallel
(P_i = D(C_i) xor C_{i-1}), so decrypting a stream costs a handful of
numpy passes regardless of length — this is the hot path, running
inside the extraction UDF on every encrypted corpus stream. CBC
encryption is inherently sequential across blocks and is only used by
the fixture writer.
"""

from __future__ import annotations

import numpy as np


def _gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiplication modulo the AES polynomial x^8+x^4+x^3+x+1
    (0x11B), by the shift-and-reduce method (FIPS 197 §4.2)."""
    out = 0
    while b:
        if b & 1:
            out ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return out & 0xFF


def _build_tables() -> dict[str, np.ndarray]:
    # multiplicative inverse via brute force (the field is 256 elements)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = np.zeros(256, dtype=np.uint8)
    for x in range(256):
        b = inv[x]
        s = 0x63
        for r in range(5):  # b ^ rotl(b,1) ^ rotl(b,2) ^ rotl(b,3) ^ rotl(b,4)
            s ^= ((b << r) | (b >> (8 - r))) & 0xFF
        sbox[x] = s
    inv_sbox = np.zeros(256, dtype=np.uint8)
    inv_sbox[sbox] = np.arange(256, dtype=np.uint8)
    muls = {k: np.array([_gf_mul(k, x) for x in range(256)], dtype=np.uint8)
            for k in (2, 3, 9, 11, 13, 14)}
    return {"sbox": sbox, "inv_sbox": inv_sbox, **{f"mul{k}": v for k, v in muls.items()}}


_T = _build_tables()
_SBOX = _T["sbox"]
_INV_SBOX = _T["inv_sbox"]
_M2, _M3, _M9, _M11, _M13, _M14 = (
    _T["mul2"], _T["mul3"], _T["mul9"], _T["mul11"], _T["mul13"], _T["mul14"]
)

# ShiftRows as a flat-index permutation. FIPS 197 state is column-major
# (flat byte i -> state[row i%4][col i//4]); row r rotates left by r, so
# out[r + 4c] = in[r + 4*((c + r) % 4)].
_SHIFT = np.array([(i % 4) + 4 * (((i // 4) + (i % 4)) % 4) for i in range(16)], dtype=np.intp)
_INV_SHIFT = np.empty(16, dtype=np.intp)
_INV_SHIFT[_SHIFT] = np.arange(16, dtype=np.intp)


def _key_schedule(key: bytes) -> np.ndarray:
    """Round keys as a (Nr+1, 16) uint8 array (§5.2 KeyExpansion);
    accepts 16-byte (AES-128, Nr=10) and 32-byte (AES-256, Nr=14) keys."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError(f"AES key must be 16 or 32 bytes, got {len(key)}")
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]  # RotWord
            t = [int(_SBOX[b]) for b in t]  # SubWord
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [int(_SBOX[b]) for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    flat = np.array(w, dtype=np.uint8).reshape(nr + 1, 16)
    return flat


def _mix_columns(b: np.ndarray) -> np.ndarray:
    s = b.reshape(-1, 4, 4)  # [block, column, row] (flat = row + 4*col)
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    out = np.empty_like(s)
    out[:, :, 0] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3
    out[:, :, 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3
    out[:, :, 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3]
    out[:, :, 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3]
    return out.reshape(-1, 16)


def _inv_mix_columns(b: np.ndarray) -> np.ndarray:
    s = b.reshape(-1, 4, 4)
    a0, a1, a2, a3 = s[:, :, 0], s[:, :, 1], s[:, :, 2], s[:, :, 3]
    out = np.empty_like(s)
    out[:, :, 0] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
    out[:, :, 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
    out[:, :, 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
    out[:, :, 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    return out.reshape(-1, 16)


def encrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """Cipher (§5.1) over a (n, 16) uint8 array of blocks."""
    b = blocks ^ rk[0]
    nr = rk.shape[0] - 1
    for r in range(1, nr):
        b = _SBOX[b][:, _SHIFT]
        b = _mix_columns(b) ^ rk[r]
    return _SBOX[b][:, _SHIFT] ^ rk[nr]


def decrypt_blocks(blocks: np.ndarray, rk: np.ndarray) -> np.ndarray:
    """InvCipher (§5.3) over a (n, 16) uint8 array of blocks."""
    nr = rk.shape[0] - 1
    b = blocks ^ rk[nr]
    for r in range(nr - 1, 0, -1):
        b = _INV_SBOX[b[:, _INV_SHIFT]] ^ rk[r]
        b = _inv_mix_columns(b)
    return _INV_SBOX[b[:, _INV_SHIFT]] ^ rk[0]


def _as_blocks(data: bytes) -> np.ndarray:
    if len(data) % 16:
        raise ValueError(f"data length {len(data)} not a multiple of the AES block size")
    return np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)


# ---------------------------------------------------------------------------
# Scalar fast path: classic 32-bit T-tables (SubBytes+ShiftRows+MixColumns
# fused — the standard software-AES construction described in the Rijndael
# proposal §5.2). CBC *encryption* is sequential across blocks, so the
# vectorized kernel pays ~0.25 ms of numpy dispatch per block; the T-table
# path runs a block in ~20 us of pure-int Python. Pinned equal to the
# numpy kernel (and thus to FIPS 197) in tests.
# ---------------------------------------------------------------------------

def _build_ttables() -> list[list[int]]:
    t0 = []
    for x in range(256):
        s = int(_SBOX[x])
        s2 = _gf_mul(s, 2)
        s3 = s2 ^ s
        t0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
    rotr8 = lambda v: ((v >> 8) | (v << 24)) & 0xFFFFFFFF  # noqa: E731
    t1 = [rotr8(v) for v in t0]
    t2 = [rotr8(v) for v in t1]
    t3 = [rotr8(v) for v in t2]
    return [t0, t1, t2, t3]


_T0, _T1, _T2, _T3 = _build_ttables()
_SBOX_I = [int(v) for v in _SBOX]


def _rk_words(rk: np.ndarray) -> list[list[int]]:
    """(Nr+1, 16) byte round keys -> per-round big-endian 32-bit words."""
    return [
        [int.from_bytes(bytes(rk[r, 4 * i : 4 * i + 4]), "big") for i in range(4)]
        for r in range(rk.shape[0])
    ]


def _encrypt_block_fast(block: bytes, rkw: list[list[int]]) -> bytes:
    w = [int.from_bytes(block[4 * i : 4 * i + 4], "big") ^ rkw[0][i] for i in range(4)]
    nr = len(rkw) - 1
    for r in range(1, nr):
        k = rkw[r]
        w = [
            _T0[(w[i] >> 24) & 0xFF]
            ^ _T1[(w[(i + 1) & 3] >> 16) & 0xFF]
            ^ _T2[(w[(i + 2) & 3] >> 8) & 0xFF]
            ^ _T3[w[(i + 3) & 3] & 0xFF]
            ^ k[i]
            for i in range(4)
        ]
    k = rkw[nr]
    out = bytearray(16)
    for i in range(4):
        v = (
            (_SBOX_I[(w[i] >> 24) & 0xFF] << 24)
            | (_SBOX_I[(w[(i + 1) & 3] >> 16) & 0xFF] << 16)
            | (_SBOX_I[(w[(i + 2) & 3] >> 8) & 0xFF] << 8)
            | _SBOX_I[w[(i + 3) & 3] & 0xFF]
        ) ^ k[i]
        out[4 * i : 4 * i + 4] = v.to_bytes(4, "big")
    return bytes(out)


def aes_ecb_encrypt(key: bytes, data: bytes) -> bytes:
    return encrypt_blocks(_as_blocks(data).copy(), _key_schedule(key)).tobytes()


def aes_ecb_decrypt(key: bytes, data: bytes) -> bytes:
    return decrypt_blocks(_as_blocks(data).copy(), _key_schedule(key)).tobytes()


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes, pad: bool = True) -> bytes:
    """CBC encryption; with pad=True applies the RFC 2898 §6.1.1-style
    1..16-byte padding the PDF spec mandates (§7.6.2 note on AESV2).
    Sequential across blocks by construction (writer + KDF side), so it
    runs on the scalar T-table kernel instead of paying per-block
    numpy dispatch."""
    if pad:
        k = 16 - (len(data) % 16)
        data = data + bytes([k]) * k
    rkw = _rk_words(_key_schedule(key))
    out = bytearray()
    prev = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        x = int.from_bytes(data[i : i + 16], "big") ^ prev
        ct = _encrypt_block_fast(x.to_bytes(16, "big"), rkw)
        out += ct
        prev = int.from_bytes(ct, "big")
    return bytes(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """CBC decryption, data-parallel over blocks (the extraction hot
    path): P = D(C) xor [iv | C[:-1]] in one vectorized pass."""
    blocks = _as_blocks(data)
    if blocks.shape[0] == 0:
        return b""
    rk = _key_schedule(key)
    plain = decrypt_blocks(blocks.copy(), rk)
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8).reshape(1, 16), blocks[:-1]])
    out = (plain ^ prev).tobytes()
    if unpad:
        k = out[-1]
        if not 1 <= k <= 16 or out[-k:] != bytes([k]) * k:
            raise ValueError("bad AES-CBC padding")
        out = out[:-k]
    return out
