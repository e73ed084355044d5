"""xxHash64 re-expressed in the DuckDB oracle dialect.

Spark's ``F.xxhash64(col)`` hashes a string column's UTF-8 bytes with
XXH64 at seed 42 (reference semantics: the public xxHash spec; parity
with Spark pinned by tests/test_xxh64_sql.py against random Unicode
strings).  MinHash/SimHash signatures are built on it, which is why
``dedup_minhash_lsh`` / ``dedup_simhash`` spent rounds 1-5 as
rows-only: "no oracle can replay xxhash64".  This module retires that
excuse by generating a pure-SQL DuckDB expression that evaluates
XXH64 bit-exactly:

- every intermediate is a HUGEINT reduced mod 2**64;
- multiplication by a 64-bit constant is done via the 32-bit split
  ``(lo(a)*C + ((hi(a)*C) & M32) << 32) & M64`` so no intermediate
  exceeds 2**97 (HUGEINT holds < 2**127 — no overflow, no UBIGINT
  wraparound dependence);
- the byte stream comes from ``lower(hex(encode(s)))`` (DuckDB strings
  are UTF-8, so the bytes match Spark's UTF8String exactly);
- the sequential state machine threads through nested single-element
  ``list_transform`` bindings (each stage value bound exactly once —
  expression size stays linear), and the 32-byte stripe / 8-byte tail
  / 1-byte tail loops are ``list_reduce`` folds.

The generated expression is self-contained (usable inside any SELECT,
including inside lambda bodies), which keeps oracle strings single-
statement — no CREATE MACRO, which the driver's one-shot oracle
runner could not execute.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_SEED = 42  # Spark's fixed xxhash64 seed

_V1_0 = (_SEED + _P1 + _P2) & _M64
_V2_0 = (_SEED + _P2) & _M64
_V3_0 = _SEED
_V4_0 = (_SEED - _P1) & _M64
_H_SHORT = (_SEED + _P5) & _M64  # initial h for inputs < 32 bytes


def _h(c: int) -> str:
    """A HUGEINT literal."""
    return f"{c}::HUGEINT"


def _mulc(a: str, c: int) -> str:
    """``(a * c) mod 2**64`` for arbitrary a < 2**64 and constant c.

    Binds ``a`` once (it appears twice in the split formula).
    """
    return (
        f"list_transform([{a}], __ma -> "
        f"(((__ma & {_h(_M32)}) * {_h(c)}"
        f" + ((((__ma >> 32) * {_h(c)}) & {_h(_M32)}) << 32))"
        f" & {_h(_M64)}))[1]"
    )


def _rotl(x: str, r: int) -> str:
    """64-bit rotate-left by constant r; binds ``x`` once."""
    return (
        f"list_transform([{x}], __rt -> "
        f"((__rt << {r}) | (__rt >> {64 - r})) & {_h(_M64)})[1]"
    )


def _round(acc: str, x: str) -> str:
    """XXH64 round: ``rotl31(acc + x*P2) * P1`` (all mod 2**64)."""
    return _mulc(_rotl(f"(({acc} + {_mulc(x, _P2)}) & {_h(_M64)})", 31), _P1)


def _merge(h: str, v: str) -> str:
    """XXH64 merge round: ``(h ^ round(0, v)) * P1 + P4``."""
    round0 = _mulc(_rotl(_mulc(v, _P2), 31), _P1)
    return f"((({_mulc(f'xor({h}, {round0})', _P1)}) + {_h(_P4)}) & {_h(_M64)})"


def xxh64_unsigned_sql(expr: str) -> str:
    """DuckDB HUGEINT expression: XXH64(utf8(expr), seed=42), unsigned.

    ``expr`` must be a VARCHAR-valued SQL expression; it is evaluated
    exactly once.  NULL propagates (callers hash non-null columns; note
    Spark's hash expressions instead *skip* null inputs).
    """
    # stage variables, innermost scope sees all outer ones:
    #   __hx hex string | __bs byte list | __n length | __q stripe count
    #   __vs stripe-fold state [v1..v4] | __h1..__h4 sequential h
    #   __a1 __a2 avalanche intermediates
    byte = (
        "(strpos('0123456789abcdef', substr(__hx, 2*__i - 1, 1)) - 1)::HUGEINT * 16"
        " + (strpos('0123456789abcdef', substr(__hx, 2*__i, 1)) - 1)::HUGEINT"
    )
    bs = f"list_transform(range(1, length(__hx)//2 + 1), __i -> {byte})"

    def w8(off: str) -> str:  # little-endian 8-byte word at 1-based offset
        return "(" + " + ".join(
            f"(__bs[{off} + {t}] << {8 * t})" for t in range(8)
        ) + ")"

    stripe = (
        "list_transform(range(0, __q), __k -> "
        f"[{w8('32*__k + 1')}, {w8('32*__k + 9')},"
        f" {w8('32*__k + 17')}, {w8('32*__k + 25')}])"
    )
    acc0 = f"[{_h(_V1_0)}, {_h(_V2_0)}, {_h(_V3_0)}, {_h(_V4_0)}]"
    vs = (
        f"list_reduce(list_prepend({acc0}, {stripe}), (__a, __s) -> ["
        + ", ".join(_round(f"__a[{i}]", f"__s[{i}]") for i in (1, 2, 3, 4))
        + "])"
    )
    # converged hash after the stripe phase (only used when __n >= 32)
    rsum = (
        f"(((({_rotl('__vs[1]', 1)} + {_rotl('__vs[2]', 7)}) & {_h(_M64)})"
        f" + (({_rotl('__vs[3]', 12)} + {_rotl('__vs[4]', 18)}) & {_h(_M64)}))"
        f" & {_h(_M64)})"
    )
    merged = rsum
    for i in (1, 2, 3, 4):
        merged = _merge(merged, f"__vs[{i}]")
    h1 = (
        f"(((CASE WHEN __n >= 32 THEN {merged} ELSE {_h(_H_SHORT)} END)"
        f" + __n::HUGEINT) & {_h(_M64)})"
    )
    # 8-byte tail words: (__n % 32) // 8 of them, starting at byte 32*__q
    t8 = f"list_transform(range(0, (__n % 32) // 8), __k -> {w8('32*__q + 8*__k + 1')})"
    round0_x = _mulc(_rotl(_mulc("__x", _P2), 31), _P1)
    tail8_step = (
        f"((({_mulc(_rotl(f'xor(__a, {round0_x})', 27), _P1)})"
        f" + {_h(_P4)}) & {_h(_M64)})"
    )
    h2 = f"list_reduce(list_prepend(__h1, {t8}), (__a, __x) -> {tail8_step})"
    # 4-byte word if __n % 8 >= 4, at 1-based offset __n - __n % 8 + 1
    w4 = "(" + " + ".join(
        f"(__bs[__n - __n % 8 + {t + 1}] << {8 * t})" for t in range(4)
    ) + ")"
    h3_then = (
        f"((({_mulc(_rotl(f'xor(__h2, (({w4} * {_h(_P1)}) & {_h(_M64)}))', 23), _P2)})"
        f" + {_h(_P3)}) & {_h(_M64)})"
    )
    h3 = f"(CASE WHEN __n % 8 >= 4 THEN {h3_then} ELSE __h2 END)"
    # byte tail: offsets [__n - __n%8 + (4 if consumed) .. __n), 0-based
    tb = (
        "list_transform(range(__n - __n % 8 +"
        " (CASE WHEN __n % 8 >= 4 THEN 4 ELSE 0 END), __n),"
        " __i -> __bs[__i + 1])"
    )
    byte_step = _mulc(
        _rotl(f"xor(__a, ((__x * {_h(_P5)}) & {_h(_M64)}))", 11), _P1
    )
    h4 = f"list_reduce(list_prepend(__h3, {tb}), (__a, __x) -> {byte_step})"
    a1 = _mulc(f"xor(__h4, __h4 >> 33)", _P2)
    a2 = _mulc(f"xor(__a1, __a1 >> 29)", _P3)
    out = "xor(__a2, __a2 >> 32)"

    # assemble the binding chain, innermost-out
    body = out
    for var, val in (
        ("__a2", a2),
        ("__a1", a1),
        ("__h4", h4),
        ("__h3", h3),
        ("__h2", h2),
        ("__h1", h1),
        ("__vs", vs),
        ("__q", "__n // 32"),
        ("__n", "len(__bs)"),
        ("__bs", bs),
        ("__hx", f"lower(hex(encode({expr})))"),
    ):
        body = f"list_transform([{val}], {var} -> {body})[1]"
    return body


#: hashLong's initial state: seed + P5 + 8 (8 = byte length of a long).
_HLONG_0 = (_SEED + _P5 + 8) & _M64


def xxh64_long_unsigned_sql(expr: str) -> str:
    """DuckDB HUGEINT expression: XXH64's fixed-width LONG fast path at
    seed 42 — ``fmix(rotl27(h0 ^ (rotl31(v*P2)*P1)) * P1 + P4)`` — the
    hash Spark's hash expressions AND the HyperLogLog++ register
    mapping use for a BIGINT column.  ``expr`` must be BIGINT-valued;
    negative values hash as their two's-complement unsigned word
    (bitwise & on a negative HUGEINT is 128-bit two's-complement, so
    ``& M64`` yields exactly the reinterpreted unsigned long).
    """
    vu = f"(({expr})::HUGEINT & {_h(_M64)})"
    k1 = _mulc(_rotl(_mulc(vu, _P2), 31), _P1)
    h = f"((({_mulc(_rotl(f'xor({_h(_HLONG_0)}, {k1})', 27), _P1)}) + {_h(_P4)}) & {_h(_M64)})"
    a1 = _mulc("xor(__lh, __lh >> 33)", _P2)
    a2 = _mulc("xor(__la, __la >> 29)", _P3)
    out = "xor(__lb, __lb >> 32)"
    body = out
    for var, val in (("__lb", a2), ("__la", a1), ("__lh", h)):
        body = f"list_transform([{val}], {var} -> {body})[1]"
    return body


def xxh64_long_sql(expr: str) -> str:
    """DuckDB BIGINT expression equal to Spark's ``F.xxhash64(expr)``
    for a BIGINT-typed ``expr`` (the fixed-width long fast path) —
    the signed two's-complement reinterpretation of
    :func:`xxh64_long_unsigned_sql`, for call sites that need value
    parity with Spark's signed output (bucketing via pmod, ORDER BY
    the hash)."""
    u = xxh64_long_unsigned_sql(expr)
    return (
        f"list_transform([{u}], __u -> CASE WHEN __u >= {_h(1 << 63)}"
        f" THEN __u - {_h(1 << 64)} ELSE __u END)[1]::BIGINT"
    )


def xxh64_sql(expr: str) -> str:
    """DuckDB BIGINT expression equal to Spark's ``F.xxhash64(expr)``
    (the unsigned hash reinterpreted as a signed two's-complement
    long, which is what Spark returns)."""
    u = xxh64_unsigned_sql(expr)
    return (
        f"list_transform([{u}], __u -> CASE WHEN __u >= {_h(1 << 63)}"
        f" THEN __u - {_h(1 << 64)} ELSE __u END)[1]::BIGINT"
    )
