"""Encrypted-PDF fixtures: a Python implementation of the PDF standard
security handler (Algorithms 2/3/5 of the PDF 1.7 spec) producing RC4
(V2/R3) and AES-128 (V4/R4 AESV2) encrypted documents with empty
passwords — the "owner-locked" class real textbooks ship with. Fully
independent of the native engine's crypto.cc (hashlib MD5 + a 15-line
RC4 + `cryptography` AES), so the two implementations cross-validate.
"""
from __future__ import annotations

import hashlib
import io
import os
import struct

PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray()
    i = j = 0
    for c in data:
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out.append(c ^ S[(S[i] + S[j]) & 0xFF])
    return bytes(out)


def compute_o(owner_pw: bytes, user_pw: bytes, r: int, keylen: int) -> bytes:
    """Algorithm 3."""
    key = hashlib.md5((owner_pw + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    key = key[:keylen]
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def file_key(user_pw: bytes, o: bytes, p: int, id0: bytes, r: int,
             keylen: int) -> bytes:
    """Algorithm 2."""
    data = (user_pw + PAD)[:32] + o + struct.pack("<i", p) + id0
    key = hashlib.md5(data).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:keylen]).digest()
    return key[:keylen]


def compute_u(fkey: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (r2) / 5 (r>=3)."""
    if r == 2:
        return rc4(fkey, PAD)
    u = rc4(fkey, hashlib.md5(PAD + id0).digest())
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in fkey), u)
    return u + b"\x00" * 16


def object_key(fkey: bytes, num: int, gen: int, aes: bool) -> bytes:
    data = fkey + struct.pack("<i", num)[:3] + struct.pack("<i", gen)[:2]
    if aes:
        data += b"sAlT"
    return hashlib.md5(data).digest()[: min(len(fkey) + 5, 16)]


def encrypt_data(data: bytes, fkey: bytes, num: int, gen: int,
                 aes: bool) -> bytes:
    k = object_key(fkey, num, gen, aes)
    if not aes:
        return rc4(k, data)
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    iv = os.urandom(16)
    padn = 16 - (len(data) % 16)
    data = data + bytes([padn]) * padn
    enc = Cipher(algorithms.AES(k), modes.CBC(iv)).encryptor()
    return iv + enc.update(data) + enc.finalize()


def make_encrypted_pdf(aes: bool = False, text: str = "Secret Figure 7",
                       user_pw: bytes = b"", owner_pw: bytes = b"") -> bytes:
    """A 1-page PDF with visible text + one vector rect, encrypted with
    the given passwords (RC4 V2/R3 or AES-128 V4/R4; empty = the
    "owner-locked" class real textbooks ship with)."""
    import zlib

    p = -44  # typical permissions
    id0 = hashlib.md5(text.encode() + b"enc-fixture").digest()
    keylen = 16
    r = 4 if aes else 3
    v = 4 if aes else 2
    o = compute_o(owner_pw or user_pw, user_pw, r, keylen)
    fkey = file_key(user_pw, o, p, id0, r, keylen)
    u = compute_u(fkey, id0, r)

    content = (
        f"BT /F1 24 Tf 72 700 Td ({text}) Tj ET\n"
        "2 w 0 0 0 RG 100 500 200 120 re S\n"
    ).encode()
    content_z = zlib.compress(content)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    enc_extra = b""
    if aes:
        enc_extra = (
            b" /CF << /StdCF << /CFM /AESV2 /Length 16 "
            b"/AuthEvent /DocOpen >> >> /StmF /StdCF /StrF /StdCF"
        )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        None,  # content stream, encrypted below as object 4
        (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
         b"/Encoding /WinAnsiEncoding >>"),
        (b"<< /Filter /Standard /V %d /R %d /Length 128 /P %d /O " %
         (v, r, p)) + hexs(o) + b" /U " + hexs(u) + enc_extra + b" >>",
    ]
    stream_data = encrypt_data(content_z, fkey, 4, 0, aes)
    objs[3] = (b"<< /Filter /FlateDecode /Length %d >>\nstream\n" %
               len(stream_data)) + stream_data + b"\nendstream"

    out = io.BytesIO()
    out.write(b"%PDF-1.6\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(b"%010d 00000 n \n" % off)
    out.write(b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID [" %
              (len(objs) + 1))
    out.write(hexs(id0) + b" " + hexs(id0) + b"] >>\n")
    out.write(b"startxref\n%d\n%%%%EOF\n" % xref)
    return out.getvalue()


# ---------------------------------------------------------------------------
# AES-256 (V5/R6, ISO 32000-2) — the modern Acrobat-X-and-later scheme.
# Writer-side Algorithm 2.B/8/9/10 via hashlib SHA-2 + `cryptography` AES,
# fully independent of native/src/crypto.cc.
# ---------------------------------------------------------------------------


def _aes_cbc_enc(key: bytes, iv: bytes, data: bytes) -> bytes:
    from cryptography.hazmat.primitives.ciphers import (Cipher, algorithms,
                                                        modes)

    enc = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    return enc.update(data) + enc.finalize()


def hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B iterated password hash."""
    K = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + K + udata) * 64
        E = _aes_cbc_enc(K[:16], K[16:32], k1)
        mod = sum(E[:16]) % 3
        K = [hashlib.sha256, hashlib.sha384, hashlib.sha512][mod](E).digest()
        i += 1
        if i >= 64 and E[-1] <= i - 32:
            break
    return K[:32]


def make_encrypted_pdf_r6(user_pw: bytes = b"", owner_pw: bytes = b"own",
                          text: str = "Secret Figure 9") -> bytes:
    """1-page AES-256 (V5/R6) encrypted PDF with visible text + a rect."""
    import zlib

    p = -44
    fkey = hashlib.sha512(b"r6-fixture-key" + user_pw + owner_pw).digest()[:32]

    def salt(tag: bytes) -> bytes:
        return hashlib.sha256(tag + user_pw + owner_pw).digest()[:8]

    uvs, uks = salt(b"uvs"), salt(b"uks")
    U = hash_2b(user_pw, uvs, b"") + uvs + uks
    UE = _aes_cbc_enc(hash_2b(user_pw, uks, b""), b"\x00" * 16, fkey)
    ovs, oks = salt(b"ovs"), salt(b"oks")
    O = hash_2b(owner_pw, ovs, U) + ovs + oks
    OE = _aes_cbc_enc(hash_2b(owner_pw, oks, U), b"\x00" * 16, fkey)
    # /Perms: P (4 LE) + FFFFFFFF + 'T' (EncryptMetadata) + 'adb' + 4 pad,
    # AES-ECB with the file key (CBC with zero IV on one block == ECB)
    perms_plain = (struct.pack("<i", p) + b"\xff\xff\xff\xff" + b"T" +
                   b"adb" + b"seed")
    Perms = _aes_cbc_enc(fkey, b"\x00" * 16, perms_plain)

    content = (
        f"BT /F1 24 Tf 72 700 Td ({text}) Tj ET\n"
        "2 w 0 0 0 RG 100 500 200 120 re S\n"
    ).encode()
    content_z = zlib.compress(content)
    iv = hashlib.md5(b"r6-iv" + content_z).digest()
    padn = 16 - (len(content_z) % 16)
    stream_data = iv + _aes_cbc_enc(fkey, iv,
                                    content_z + bytes([padn]) * padn)

    def hexs(b: bytes) -> bytes:
        return b"<" + b.hex().encode() + b">"

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        (b"<< /Filter /FlateDecode /Length %d >>\nstream\n" %
         len(stream_data)) + stream_data + b"\nendstream",
        (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
         b"/Encoding /WinAnsiEncoding >>"),
        (b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P %d " % p
         + b"/CF << /StdCF << /CFM /AESV3 /Length 32 /AuthEvent /DocOpen "
         b">> >> /StmF /StdCF /StrF /StdCF /O " + hexs(O) + b" /U "
         + hexs(U) + b" /OE " + hexs(OE) + b" /UE " + hexs(UE)
         + b" /Perms " + hexs(Perms) + b" >>"),
    ]
    out = io.BytesIO()
    out.write(b"%PDF-2.0\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(out.tell())
        out.write(b"%d 0 obj\n" % i)
        out.write(body)
        out.write(b"\nendobj\n")
    xref = out.tell()
    out.write(b"xref\n0 %d\n" % (len(objs) + 1))
    out.write(b"0000000000 65535 f \n")
    for off in offsets[1:]:
        out.write(b"%010d 00000 n \n" % off)
    id0 = hashlib.md5(text.encode() + b"r6-fixture").digest()
    out.write(b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /ID [" %
              (len(objs) + 1))
    out.write(hexs(id0) + b" " + hexs(id0) + b"] >>\n")
    out.write(b"startxref\n%d\n%%%%EOF\n" % xref)
    return out.getvalue()
