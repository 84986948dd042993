"""Transform kinds and planner flags.

Mirrors the capability surface of FFTW's ``fftw3.h`` (reference:
``fftw/fftw3.h:109-110`` for the r2r kind enum, ``fftw3.h:475-489`` for the
planner flags) but re-expressed for a functional JAX engine: transforms are
pure functions on logical arrays, there are no pointers or strides.

All transforms are **unnormalized**, exactly like FFTW: a forward transform
followed by a backward transform multiplies the input by N (the logical size
of the transform).
"""
from __future__ import annotations

import enum


class Kind(enum.Enum):
    """1-D transform kinds.

    The r2r members match FFTW's ``fftw_r2r_kind`` semantics
    (reference ``fftw/fftw3.h:109-110`` and the "What FFTW Really Computes"
    definitions), including the halfcomplex R2HC/HC2R formats.
    """

    C2C = "c2c"          # complex -> complex, sign in Problem
    R2C = "r2c"          # real n -> complex n//2+1 (rdft2 format)
    C2R = "c2r"          # complex n//2+1 -> real n (unnormalized inverse)
    # r2r kinds (real -> real, same length):
    R2HC = "r2hc"        # real -> halfcomplex [r0..r_{n/2}, i_{(n+1)/2-1}..i_1]
    HC2R = "hc2r"        # halfcomplex -> real (unnormalized inverse)
    DHT = "dht"          # discrete Hartley transform
    REDFT00 = "redft00"  # DCT-I
    REDFT01 = "redft01"  # DCT-III
    REDFT10 = "redft10"  # DCT-II
    REDFT11 = "redft11"  # DCT-IV
    RODFT00 = "rodft00"  # DST-I
    RODFT01 = "rodft01"  # DST-III
    RODFT10 = "rodft10"  # DST-II
    RODFT11 = "rodft11"  # DST-IV


R2R_KINDS = (
    Kind.R2HC, Kind.HC2R, Kind.DHT,
    Kind.REDFT00, Kind.REDFT01, Kind.REDFT10, Kind.REDFT11,
    Kind.RODFT00, Kind.RODFT01, Kind.RODFT10, Kind.RODFT11,
)

# Transform direction signs (fftw3.h: FFTW_FORWARD/-BACKWARD).
FORWARD = -1
BACKWARD = +1

#: fftw_r2r_kind analog (fftw3.h:109-110 enum): the type name user code
#: annotates with, plus the enum's INTEGER values for ABI-level
#: translation (FFTW_R2HC=0 .. FFTW_RODFT11=10).  Kind strings, Kind
#: members, and these integers are all accepted wherever a kind is
#: expected (plan_r2r / plan_many_r2r / guru).
r2r_kind = Kind

R2R_KIND_VALUES = {
    0: Kind.R2HC, 1: Kind.HC2R, 2: Kind.DHT,
    3: Kind.REDFT00, 4: Kind.REDFT01, 5: Kind.REDFT10, 6: Kind.REDFT11,
    7: Kind.RODFT00, 8: Kind.RODFT01, 9: Kind.RODFT10, 10: Kind.RODFT11,
}

# ---------------------------------------------------------------------------
# Planner flags — same bit values as fftw3.h:475-489 so user code translates
# one-to-one.  Only the planning-rigor and wisdom bits are meaningful here;
# memory/alignment bits (DESTROY_INPUT, UNALIGNED, ...) are accepted and
# ignored because JAX arrays are immutable logical values.
# ---------------------------------------------------------------------------
MEASURE = 0
DESTROY_INPUT = 1 << 0
UNALIGNED = 1 << 1
CONSERVE_MEMORY = 1 << 2
EXHAUSTIVE = 1 << 3
PRESERVE_INPUT = 1 << 4
PATIENT = 1 << 5
ESTIMATE = 1 << 6
WISDOM_ONLY = 1 << 21

#: Patience ladder, least to most patient (reference: the impatience lattice
#: of fftw_mapflags, fftw/fftw_api.c:144-231, collapsed to four rungs).
PATIENCE_ESTIMATE = 0
PATIENCE_MEASURE = 1
PATIENCE_PATIENT = 2
PATIENCE_EXHAUSTIVE = 3


def patience_of_flags(flags: int) -> int:
    """Map API flag bits onto the planner patience ladder."""
    if flags & ESTIMATE:
        return PATIENCE_ESTIMATE
    if flags & EXHAUSTIVE:
        return PATIENCE_EXHAUSTIVE
    if flags & PATIENT:
        return PATIENCE_PATIENT
    return PATIENCE_MEASURE


#: r2r kind name <-> enum helpers for wisdom serialization.
def kind_from_name(name) -> Kind:
    if isinstance(name, Kind):
        return name
    if isinstance(name, int):
        return R2R_KIND_VALUES[name]       # fftw3.h enum integer
    return Kind(name.lower())


#: logical size of one r2r transform for normalization purposes.
#: FFTW manual "Real even/odd DFTs": the unnormalized inverse pairs are
#: REDFT00<->REDFT00 with N=2(n-1), RODFT00<->RODFT00 with N=2(n+1),
#: REDFT10<->REDFT01 and RODFT10<->RODFT01 with N=2n, and REDFT11/RODFT11
#: are self-inverse with N=2n.  DHT and R2HC/HC2R have N=n.
def logical_size(kind: Kind, n: int) -> int:
    if kind in (Kind.C2C, Kind.R2C, Kind.C2R, Kind.DHT, Kind.R2HC, Kind.HC2R):
        return n
    if kind == Kind.REDFT00:
        return 2 * (n - 1)
    if kind == Kind.RODFT00:
        return 2 * (n + 1)
    return 2 * n
