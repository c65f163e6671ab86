"""Homomorphic PRINCE block cipher — the reference's flagship application.

TPU-native redesign of examples/Prince/Prince.{h,cu}.  Structural differences
from the reference (deliberate, per SURVEY.md section 3.5):

  * The reference keeps 64 bit-slice ciphertexts as host NTL ZZX objects,
    round-trips every S-box through ZZX<->GPU, runs linear layers on the host
    and parallelises over GPUs with one OpenMP thread per device
    (Prince.cu:191-202, 460-664).  Here the whole 64-ciphertext state is a
    batched device array [64, pnum, len]; linear layers are index gathers +
    CRT adds on device; S-boxes evaluate all 16 nibbles as one batch; mapping
    onto multiple chips is a (batch, crt) GSPMD sharding instead of threads.

  * Round constants are generated from the published PRINCE spec values
    rather than a bit table; the M'/ShiftRow wiring is derived from the same
    block structure (diag(M0^, M1^, M1^, M0^)) as the reference's unrolled
    assignments (Prince.cu:472-664), verified element-for-element in tests.

The gate schedule inside _sbox/_inv_sbox (which products are relinearized,
where modswitches happen) follows Prince.cu:204-322 and 339-460 exactly,
since it determines noise growth and level bookkeeping.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import hostmath as hm
from ..context import Context
from ..dhs import CuDHS
from ..ops import barrett as barrett_ops
from ..ops import crt as crt_ops
from ..ops import modp, ntt
from ..ops import ntt_kernels as nk
from ..ops import pointwise as pw
from ..ops import relin as relin_ops

CIRCUIT_DEPTH = 25  # Prince.cu:8

# Published PRINCE round constants (RC0..RC11); the reference stores the same
# values as a bit table (Prince.cu:10-34), MSB-first per 64-bit word.
RC_HEX = [
    0x0000000000000000, 0x13198A2E03707344, 0xA4093822299F31D0,
    0x082EFA98EC4E6C89, 0x452821E638D01377, 0xBE5466CF34E90C6C,
    0x7EF84F78FD955CB1, 0x85840851F1AC43AA, 0xC882D32F25323C54,
    0x64A51195E0E3610D, 0xD3B5A399CA0C2399, 0xC0AC29B7C97C50DD,
]


def rc_bits(rnd: int) -> list[int]:
    v = RC_HEX[rnd]
    return [(v >> (63 - i)) & 1 for i in range(64)]


def _mp_skip0(i: int) -> int:
    # block M0^: output i of a 16-bit block sums its column group minus one
    # position (pattern recovered from Prince.cu:476-491)
    return 4 * ((i % 4 - i // 4) % 4) + (i % 4)


def mp_index_table() -> np.ndarray:
    """[64, 3] input indices summed into each M' output (Prince.cu:472-550)."""
    out = np.zeros((64, 3), dtype=np.int32)
    block_kind = [0, 1, 1, 0]  # M' = diag(M0^, M1^, M1^, M0^)
    for b in range(4):
        for i in range(16):
            skip = _mp_skip0((i + 4 * block_kind[b]) % 16)
            group = [4 * k + i % 4 for k in range(4)]
            sel = [g for g in group if g != skip]
            out[16 * b + i] = [16 * b + s for s in sel]
    return out


def _apply_block_rotation(perm: list[int], i0: int, rot: int):
    idx = [i0 + d for d in (0, 1, 2, 3)] + \
          [i0 + 16 + d for d in (0, 1, 2, 3)] + \
          [i0 + 32 + d for d in (0, 1, 2, 3)] + \
          [i0 + 48 + d for d in (0, 1, 2, 3)]
    vals = [perm[j] for j in idx]
    for k, j in enumerate(idx):
        perm[j] = vals[(k + 4 * rot) % 16]


def shiftrow_perm(inverse: bool) -> np.ndarray:
    """out[i] = in[perm[i]] for ShiftRow / inv_ShiftRow (Prince.cu:552-664)."""
    perm = list(range(64))
    rots = {4: 1, 8: 2, 12: 3}
    for i0, r in rots.items():
        _apply_block_rotation(perm, i0, r if not inverse else (4 - r) % 4)
    return np.array(perm, dtype=np.int32)


class Prince:
    """Homomorphic PRINCE over a CuDHS instance (Prince.h:3-36)."""

    EXPECTED_FINAL = ("100111111011010100011001001101011111110000111101"
                      "1111010100100100")  # Prince.cu:96
    EXPECTED_ROUNDS = {  # per-round known-answer states (Prince.cu:108-147)
        0: "0100010001000100010001000100010001000100010001000100010001000100",
        1: "1100000111000101111011011001100010100001001010100010000110111011",
        2: "0001010111110110111001101000001101110010101111110010111100010111",
        3: "0000111110110100100011001100001110111010101010110110101101110000",
    }

    def __init__(self, dhs: CuDHS | None = None, seed: int | None = 7):
        self.dhs = dhs or CuDHS(CIRCUIT_DEPTH, 2, 16, 25, 25, 21845, seed=seed)
        self.ctx: Context = self.dhs.ctx
        self.level = 0
        self._layer_cache: dict = {}
        self._mp_idx = jnp.asarray(mp_index_table())
        self._sr = jnp.asarray(shiftrow_perm(False))
        self._isr = jnp.asarray(shiftrow_perm(True))

    # ------------------------------------------------------------------
    # host <-> device state
    # ------------------------------------------------------------------
    def encrypt_state(self, bits: list[int]) -> jnp.ndarray:
        """64 bits -> CRT-domain batched ciphertext state [64, pnum, clen]."""
        cts = self.dhs.encrypt_many([[b] for b in bits], 0)
        return self._state_from_ints(cts, 0)

    def _state_from_ints(self, cts: list[list[int]], lvl: int) -> jnp.ndarray:
        pr = self.ctx.params
        words = pr.words_coeff(lvl)
        raws = np.stack([hm.ints_to_words(c, words, pr.raw_len) for c in cts])
        return self.ctx._jit_r2c(lvl)(jnp.asarray(raws))

    def decrypt_state(self, state: jnp.ndarray, lvl: int) -> list[int]:
        """Decrypt constant terms of all 64 ciphertexts."""
        pr = self.ctx.params
        raw = np.asarray(self.ctx._jit_c2r(lvl)(state))
        cts = [hm.words_to_ints(raw[i])[: pr.mod_len] for i in range(raw.shape[0])]
        outs = self.dhs.decrypt_many(cts, lvl)
        return [o[0] if o else 0 for o in outs]

    # ------------------------------------------------------------------
    # linear layers (device, CRT domain)
    # ------------------------------------------------------------------
    def _crt_add(self, x, y, lvl):
        pn = self.ctx.params.num_crt_prime_lvl(lvl)
        return pw.crt_add(x, y, self.ctx.primes[:pn])

    def add_round_key(self, state, key_state, lvl):
        return self._crt_add(state, key_state, lvl)

    def add_rc(self, state, rnd, lvl):
        pn = self.ctx.params.num_crt_prime_lvl(lvl)
        rc = jnp.asarray(np.array(rc_bits(rnd), dtype=np.uint32))
        p = self.ctx.primes[:pn]
        v = (state[:, :, 0] + rc[:, None]) % p[None, :]
        return state.at[:, :, 0].set(v)

    def m_p(self, state, lvl):
        g = state[self._mp_idx]  # [64, 3, pnum, n]
        s = self._crt_add(g[:, 0], g[:, 1], lvl)
        return self._crt_add(s, g[:, 2], lvl)

    def shift_row(self, state):
        return state[self._sr]

    def inv_shift_row(self, state):
        return state[self._isr]

    def mix_column(self, state, lvl):
        return self.shift_row(self.m_p(state, lvl))

    def inv_mix_column(self, state, lvl):
        return self.m_p(self.inv_shift_row(state), lvl)

    def key_expansion(self, key_state, lvl):
        """key' = rotate-right-by-1, then key'[63] += key[0] (Prince.cu:664-672)."""
        rot = jnp.roll(key_state, 1, axis=0)
        last = self._crt_add(rot[63], key_state[0], lvl)
        return rot.at[63].set(last)

    # ------------------------------------------------------------------
    # S-box layers (device, jitted per level)
    # ------------------------------------------------------------------
    def table_args(self):
        """Device-resident big tables threaded through every jitted layer."""
        ctx = self.ctx
        return dict(ek_lo=ctx.ek_ntt[0], ek_hi=ctx.ek_ntt[1],
                    u_lo=ctx.u_ntt[0], u_hi=ctx.u_ntt[1],
                    m_lo=ctx.m_ntt[0], m_hi=ctx.m_ntt[1],
                    m_crt=ctx.m_crt_dev)

    def _layer_consts(self, lvl):
        ctx = self.ctx
        pr = ctx.params
        pn = pr.num_crt_prime_lvl(lvl)
        return dict(
            pn=pn,
            primes=ctx.primes_np[:pn],
            mus=(ctx.mus_np[0][:pn], ctx.mus_np[1][:pn]),
            icrt=ctx._icrt[lvl],
            invp_last=ctx.invp_np[pn - 1, : pn - 1],
            knum=pr.num_eval_key_lvl(lvl),
        )

    def _ops(self, lvl):
        """Closures for level-lvl primitives over batched arrays.

        Each closure takes the device table bundle `tb` (see table_args) as
        its last argument so large tables stay jit parameters.
        """
        ctx = self.ctx
        pr = ctx.params
        n = ctx.n
        cst = self._layer_consts(lvl)
        pn = cst["pn"]
        primes_np = cst["primes"]
        mus_np = cst["mus"]
        m_words, mi_words, bi = cst["icrt"]
        invp_np = cst["invp_last"]

        def consts():
            pj = jnp.asarray(primes_np)
            muj = (jnp.asarray(mus_np[0]), jnp.asarray(mus_np[1]))
            return pj, muj

        layout = ctx.ntt_layout

        def c2n(c, tb):
            return nk.fwd_linear(c, n, layout=layout)

        def n2c_prod(pair, tb):
            pj, muj = consts()
            full = nk.inv_linear(pair, n, pj, muj, layout=layout)
            return barrett_ops.barrett_reduce(
                full, mod_len=ctx.mod_len, n=n,
                u_ntt=(tb["u_lo"][:pn], tb["u_hi"][:pn]),
                m_ntt=(tb["m_lo"][:pn], tb["m_hi"][:pn]),
                m_crt=tb["m_crt"][:pn], primes=pj, mus=muj, layout=layout)

        def raw_of(c, tb):
            pj, muj = consts()
            return crt_ops.icrt_to_raw(c, pj, muj, jnp.asarray(bi),
                                       jnp.asarray(mi_words),
                                       jnp.asarray(m_words))

        def raw_of_prod(pair, tb):
            return raw_of(n2c_prod(pair, tb), tb)

        def relin_raw(raw, tb):
            pair = relin_ops.relinearize(raw, tb["ek_lo"], tb["ek_hi"],
                                         w=pr.log_relin, knum=cst["knum"],
                                         pnum=pn, n=n, layout=layout)
            return n2c_prod(pair, tb)

        def modswitch(c, tb):
            pj, muj = consts()
            return pw.mod_switch(c, pj, muj, jnp.asarray(invp_np), pr.mod_msg)

        def cadd(x, y, tb=None):
            pj, _ = consts()
            return pw.crt_add(x, y, pj)

        def cnot(x, tb=None):
            pj, _ = consts()
            v = (x[..., :, 0] + jnp.uint32(pr.mod_msg - 1)) % pj[None, :]
            return x.at[..., :, 0].set(v)

        return dict(c2n=c2n, n2c_prod=n2c_prod, relin=relin_raw,
                    raw_of=raw_of, raw_of_prod=raw_of_prod,
                    modswitch=modswitch, cadd=cadd, cnot=cnot)

    def _build_sbox_stages(self, lvl: int, inverse: bool):
        """The S-box layer as a list of separately-jitted stages.

        Same computation as _build_sbox_layer, split at natural pipeline
        boundaries so each XLA graph stays small: the monolithic layer jit
        at the Prince config (25 primes, 32k ring) produced a ~3 MB MLIR
        module whose remote compile got SIGKILLed (r4,
        examples/prince_kat_full_r04.log).  Intermediates stay
        device-resident between stages; the extra dispatches cost ~25 ms
        each through the tunnel — noise against minutes of compile.
        """
        o0 = self._ops(lvl)
        o1 = self._ops(lvl + 1)
        mul = modp.mul_modp

        # The pairwise-product computation is split across TWO jits:
        # mixing the concat-of-products pattern with a Pallas call in one
        # XLA program faults the TPU worker at shallow-level shapes in a
        # shape-dependent way (pnum 3 with per-pair muls, pnum 5 even with
        # the batched-mul form; r4/r5 KAT layer-11 crashes, bisected in
        # scripts/tpu_probe_products22.py).  A Pallas-only stage (stack +
        # forward NTT) followed by a Pallas-free stage (operand concat +
        # one batched mul) is the combination proven clean on-device at
        # pnum 3 and 5.  Elementwise mul is order-invariant => bit-exact.
        def c2n_abcd(state, tb):
            abcd = jnp.stack([state[0::4], state[1::4], state[2::4],
                              state[3::4]])  # [4, 16, pn, clen]
            nt = o0["c2n"](abcd, tb)
            return nt[0], nt[1], abcd

        def pairwise(nt_lo, nt_hi, tb):
            A = (nt_lo[0], nt_hi[0])
            B = (nt_lo[1], nt_hi[1])
            C = (nt_lo[2], nt_hi[2])
            D = (nt_lo[3], nt_hi[3])
            # rows: [ab, cd | ac, ad, bc, bd], 16 planes each
            u = (jnp.concatenate([A[0], C[0], A[0], A[0], B[0], B[0]]),
                 jnp.concatenate([A[1], C[1], A[1], A[1], B[1], B[1]]))
            v = (jnp.concatenate([B[0], D[0], C[0], D[0], C[0], D[0]]),
                 jnp.concatenate([B[1], D[1], C[1], D[1], C[1], D[1]]))
            prod = mul(u, v)
            return (prod[0][:32], prod[1][:32],
                    prod[0][32:], prod[1][32:])

        def relin_prod0(rl_lo, rl_hi, tb):
            return o0["raw_of_prod"]((rl_lo, rl_hi), tb)

        def relin_main0(raw, tb):
            return o0["relin"](raw, tb)

        def reduce_others(ot_lo, ot_hi, tb):
            return o0["n2c_prod"]((ot_lo, ot_hi), tb)

        def switch_and_xor(rl, ot_c, abcd, tb):
            ab_c, cd_c = rl[:16], rl[16:]
            ac_c, ad_c, bc_c, bd_c = (ot_c[0:16], ot_c[16:32],
                                      ot_c[32:48], ot_c[48:64])
            stack = jnp.concatenate([ab_c, cd_c, ac_c, ad_c, bc_c, bd_c,
                                     abcd[0], abcd[1], abcd[2], abcd[3]])
            sw = o0["modswitch"](stack, tb)
            (ab1, cd1, ac1, ad1, bc1, bd1, a1, b1, c1, d1) = (
                sw[16 * i: 16 * (i + 1)] for i in range(10))
            x = o1["cadd"]
            if not inverse:
                out0 = o1["cnot"](x(x(x(a1, c1), ab1), bc1))
                out1 = x(x(x(x(a1, d1), ac1), ad1), cd1)
                out2 = o1["cnot"](x(x(ac1, bc1), bd1))
                out3 = o1["cnot"](x(x(x(x(x(a1, b1), ab1), ad1), bc1), cd1))
            else:
                out0 = o1["cnot"](x(x(x(x(x(c1, d1), ab1), bc1), bd1), cd1))
                out1 = x(x(x(x(x(b1, d1), ac1), bc1), bd1), cd1)
                out2 = o1["cnot"](x(x(x(ab1, ac1), bc1), bd1))
                out3 = o1["cnot"](x(x(x(a1, ab1), bc1), cd1))
            outs = jnp.concatenate([out0, out1, out2, out3])
            six = jnp.concatenate([a1, b1, c1, d1, ab1, cd1])
            return outs, six

        # cubic products: same Pallas / concat+mul separation as
        # c2n_abcd / pairwise (see the comment above)
        def cubic_c2n(six, tb):
            lo, hi = o1["c2n"](six, tb)
            return lo, hi

        def cubic_mul(nt_lo, nt_hi, tb):
            A1 = (nt_lo[0:16], nt_hi[0:16])
            B1 = (nt_lo[16:32], nt_hi[16:32])
            C1 = (nt_lo[32:48], nt_hi[32:48])
            D1 = (nt_lo[48:64], nt_hi[48:64])
            AB1 = (nt_lo[64:80], nt_hi[64:80])
            CD1 = (nt_lo[80:96], nt_hi[80:96])
            # rows: [abd, acd, bcd, abc]
            u = (jnp.concatenate([AB1[0], CD1[0], CD1[0], AB1[0]]),
                 jnp.concatenate([AB1[1], CD1[1], CD1[1], AB1[1]]))
            v = (jnp.concatenate([D1[0], A1[0], B1[0], C1[0]]),
                 jnp.concatenate([D1[1], A1[1], B1[1], C1[1]]))
            return mul(u, v)

        def cubic_n2c(cub_lo, cub_hi, tb):
            return o1["n2c_prod"]((cub_lo, cub_hi), tb)

        def xor_cubic_raw(outs, cub_c, tb):
            abd_c, acd_c, bcd_c, abc_c = (cub_c[0:16], cub_c[16:32],
                                          cub_c[32:48], cub_c[48:64])
            out0, out1, out2, out3 = (outs[0:16], outs[16:32],
                                      outs[32:48], outs[48:64])
            x = o1["cadd"]
            if not inverse:
                out0 = x(x(x(out0, abd_c), acd_c), bcd_c)
                out1 = x(x(out1, abc_c), acd_c)
                out2 = x(x(out2, abc_c), bcd_c)
                out3 = x(out3, bcd_c)
            else:
                out0 = x(x(x(out0, abc_c), abd_c), bcd_c)
                out1 = x(x(out1, acd_c), bcd_c)
                out2 = x(out2, bcd_c)
                out3 = x(x(out3, abd_c), acd_c)
            outs = jnp.concatenate([out0, out1, out2, out3])
            return o1["raw_of"](outs, tb)

        def relin_main1(raw, tb):
            return o1["relin"](raw, tb)

        def switch_final(outs, tb):
            outs = o1["modswitch"](outs, tb)
            out0, out1, out2, out3 = (outs[0:16], outs[16:32],
                                      outs[32:48], outs[48:64])
            res = jnp.stack([out0, out1, out2, out3], axis=1)
            return res.reshape((64,) + res.shape[2:])

        return [("c2n_abcd", c2n_abcd), ("pairwise", pairwise),
                ("relin_prod0", relin_prod0),
                ("relin_main0", relin_main0), ("reduce_others", reduce_others),
                ("switch_and_xor", switch_and_xor),
                ("cubic_c2n", cubic_c2n), ("cubic_mul", cubic_mul),
                ("cubic_n2c", cubic_n2c),
                ("xor_cubic_raw", xor_cubic_raw),
                ("relin_main1", relin_main1), ("switch_final", switch_final)]

    def _run_sbox_stages(self, stages, state, tb):
        """Execute the staged layer; intermediates stay on device."""
        import os
        import sys
        import time

        verbose = os.environ.get("CUHE_PRINCE_TIMING", "0") == "1"
        fns = {}
        for nm, fn in stages:
            if not verbose:
                fns[nm] = fn
                continue

            def timed(f=fn, nm=nm):
                def run(*a):
                    t0 = time.time()
                    out = f(*a)
                    dt = time.time() - t0
                    if dt > 5:   # dispatch is ms; >5s means it compiled
                        print(f"    stage {nm}: {dt:.1f}s",
                              file=sys.stderr, flush=True)
                    return out
                return run

            fns[nm] = timed()
        nt_lo, nt_hi, abcd = fns["c2n_abcd"](state, tb)
        rl_lo, rl_hi, ot_lo, ot_hi = fns["pairwise"](nt_lo, nt_hi, tb)
        raw0 = fns["relin_prod0"](rl_lo, rl_hi, tb)
        rl = fns["relin_main0"](raw0, tb)
        ot_c = fns["reduce_others"](ot_lo, ot_hi, tb)
        outs, six = fns["switch_and_xor"](rl, ot_c, abcd, tb)
        nt6_lo, nt6_hi = fns["cubic_c2n"](six, tb)
        cub_lo, cub_hi = fns["cubic_mul"](nt6_lo, nt6_hi, tb)
        cub_c = fns["cubic_n2c"](cub_lo, cub_hi, tb)
        raw1 = fns["xor_cubic_raw"](outs, cub_c, tb)
        outs2 = fns["relin_main1"](raw1, tb)
        return fns["switch_final"](outs2, tb)

    def _build_sbox_layer(self, lvl: int, inverse: bool):
        """One full S-box substitution layer: 16 nibbles batched.

        Gate schedule identical to _sbox / _inv_sbox (Prince.cu:204-322,
        339-460): 6 pairwise products, relin only ab & cd, modswitch all ten
        linear/quadratic terms, XOR algebra one level down, 4 cubic products,
        final relin+modswitch.  Level rises by 2.
        """
        o0 = self._ops(lvl)
        o1 = self._ops(lvl + 1)
        mul = modp.mul_modp

        def layer(state, tb):
            # state: [64, pn, clen] CRT at lvl; nibble bits a,b,c,d
            abcd = jnp.stack([state[0::4], state[1::4], state[2::4],
                              state[3::4]])  # [4, 16, pn, clen]
            nt = o0["c2n"](abcd, tb)
            A = (nt[0][0], nt[1][0])
            B = (nt[0][1], nt[1][1])
            C = (nt[0][2], nt[1][2])
            D = (nt[0][3], nt[1][3])
            # six pairwise products (NTT pairs [16, pn, n])
            prods = {"ab": mul(A, B), "ac": mul(A, C), "ad": mul(A, D),
                     "bc": mul(B, C), "bd": mul(B, D), "cd": mul(C, D)}
            # relin ab & cd (batched as [2*16]); others just reduced
            rl_in = (jnp.concatenate([prods["ab"][0], prods["cd"][0]]),
                     jnp.concatenate([prods["ab"][1], prods["cd"][1]]))
            rl = o0["relin"](o0["raw_of_prod"](rl_in, tb), tb)
            ab_c, cd_c = rl[:16], rl[16:]
            ot_in = (jnp.concatenate([prods[k][0] for k in ("ac", "ad", "bc", "bd")]),
                     jnp.concatenate([prods[k][1] for k in ("ac", "ad", "bc", "bd")]))
            ot_c = o0["n2c_prod"](ot_in, tb)
            ac_c, ad_c, bc_c, bd_c = (ot_c[0:16], ot_c[16:32],
                                      ot_c[32:48], ot_c[48:64])
            # modswitch everything to lvl+1
            stack = jnp.concatenate([ab_c, cd_c, ac_c, ad_c, bc_c, bd_c,
                                     abcd[0], abcd[1], abcd[2], abcd[3]])
            sw = o0["modswitch"](stack, tb)
            (ab1, cd1, ac1, ad1, bc1, bd1, a1, b1, c1, d1) = (
                sw[16 * i: 16 * (i + 1)] for i in range(10))

            x = o1["cadd"]
            if not inverse:
                # out0 = a+c+ab+bc+1 ; out1 = a+d+ac+ad+cd
                # out2 = ac+bc+bd+1  ; out3 = a+b+ab+ad+bc+cd+1
                out0 = o1["cnot"](x(x(x(a1, c1), ab1), bc1))
                out1 = x(x(x(x(a1, d1), ac1), ad1), cd1)
                out2 = o1["cnot"](x(x(ac1, bc1), bd1))
                out3 = o1["cnot"](x(x(x(x(x(a1, b1), ab1), ad1), bc1), cd1))
            else:
                # out0 = c+d+ab+bc+bd+cd+1 ; out1 = b+d+ac+bc+bd+cd
                # out2 = ab+ac+bc+bd+1     ; out3 = a+ab+bc+cd+1
                out0 = o1["cnot"](x(x(x(x(x(c1, d1), ab1), bc1), bd1), cd1))
                out1 = x(x(x(x(x(b1, d1), ac1), bc1), bd1), cd1)
                out2 = o1["cnot"](x(x(x(ab1, ac1), bc1), bd1))
                out3 = o1["cnot"](x(x(x(a1, ab1), bc1), cd1))

            # cubic terms at lvl+1: ntt of a,b,c,d,ab,cd
            six = jnp.concatenate([a1, b1, c1, d1, ab1, cd1])
            nt6 = o1["c2n"](six, tb)
            A1 = (nt6[0][0:16], nt6[1][0:16])
            B1 = (nt6[0][16:32], nt6[1][16:32])
            C1 = (nt6[0][32:48], nt6[1][32:48])
            D1 = (nt6[0][48:64], nt6[1][48:64])
            AB1 = (nt6[0][64:80], nt6[1][64:80])
            CD1 = (nt6[0][80:96], nt6[1][80:96])
            abd = mul(AB1, D1)
            acd = mul(CD1, A1)
            bcd = mul(CD1, B1)
            abc = mul(AB1, C1)
            cubic = (jnp.concatenate([abd[0], acd[0], bcd[0], abc[0]]),
                     jnp.concatenate([abd[1], acd[1], bcd[1], abc[1]]))
            cub_c = o1["n2c_prod"](cubic, tb)
            abd_c, acd_c, bcd_c, abc_c = (cub_c[0:16], cub_c[16:32],
                                          cub_c[32:48], cub_c[48:64])
            if not inverse:
                out0 = x(x(x(out0, abd_c), acd_c), bcd_c)
                out1 = x(x(out1, abc_c), acd_c)
                out2 = x(x(out2, abc_c), bcd_c)
                out3 = x(out3, bcd_c)
            else:
                out0 = x(x(x(out0, abc_c), abd_c), bcd_c)
                out1 = x(x(out1, acd_c), bcd_c)
                out2 = x(out2, bcd_c)
                out3 = x(x(out3, abd_c), acd_c)

            # final relin + modswitch of the four outputs -> lvl+2
            outs = jnp.concatenate([out0, out1, out2, out3])
            outs = o1["relin"](o1["raw_of"](outs, tb), tb)
            outs = o1["modswitch"](outs, tb)
            out0, out1, out2, out3 = (outs[0:16], outs[16:32],
                                      outs[32:48], outs[48:64])
            # reassemble [64] in nibble order
            res = jnp.stack([out0, out1, out2, out3], axis=1)
            return res.reshape((64,) + res.shape[2:])

        return layer

    def sbox_layer(self, state, inverse: bool = False):
        import os
        import sys
        import time

        split = os.environ.get("CUHE_SBOX_SPLIT", "1") != "0"
        key = (self.level, inverse, split)
        fresh = key not in self._layer_cache
        if fresh:
            if split:
                stages = [(nm, jax.jit(fn)) for nm, fn in
                          self._build_sbox_stages(self.level, inverse)]
                self._layer_cache[key] = (
                    lambda s, tb: self._run_sbox_stages(stages, s, tb))
            else:
                self._layer_cache[key] = jax.jit(
                    self._build_sbox_layer(self.level, inverse))
        t0 = time.time()
        out = self._layer_cache[key](state, self.table_args())
        if os.environ.get("CUHE_PRINCE_TIMING", "0") == "1":
            # dispatch is async; this brackets trace+compile (synchronous,
            # the dominant cost per VERDICT r3) plus dispatch
            print(f"  sbox_layer lvl={self.level} inverse={inverse} "
                  f"{'trace+compile+dispatch' if fresh else 'dispatch'}: "
                  f"{time.time() - t0:.1f}s", file=sys.stderr, flush=True)
        self.level += 2
        return out

    # ------------------------------------------------------------------
    # full circuit (princeEncrypt, Prince.cu:148-188)
    # ------------------------------------------------------------------
    def encrypt_blocks(self, message_bits, key0_bits, key1_bits,
                       max_rounds: int | None = None, check=None,
                       resume=None, on_layer=None):
        """Run the PRINCE circuit homomorphically.

        message/key bits: lists of 64 ints.  Returns the final CRT-domain
        state (level CIRCUIT_DEPTH-1) or, with max_rounds set, the state
        after that many S-box layers (for known-answer testing).

        resume: optional (state, level, done_layers) from a checkpoint
        taken right after S-box layer `done_layers` (utils.checkpoint /
        examples/run_prince.py --resume): message/key ciphertexts are
        re-derived (deterministic for a fixed seed), the circuit
        fast-forwards past the first `done_layers` S-box layers and
        continues from the saved state.  on_layer(done, state, level) is
        invoked after every applied S-box layer (checkpoint hook).  The
        reference has no mid-circuit persistence at all (SURVEY.md
        section 5).
        """
        self.level = 0
        state = self.encrypt_state(message_bits)
        k0 = self.encrypt_state(key0_bits)
        k1 = self.encrypt_state(key1_bits)
        skip = 0
        if resume is not None:
            state, self.level, skip = resume[0], int(resume[1]), int(resume[2])
        live = skip == 0
        rnd = 0
        done = 0

        def sbox(s, inverse):
            # fast-forward guard: layers <= skip were in the checkpoint
            nonlocal done, live
            done += 1
            if done <= skip:
                live = done == skip
                return s
            s = self.sbox_layer(s, inverse=inverse)
            if on_layer is not None:
                on_layer(done, s, self.level)
            return s

        def lin(s, fn):
            # linear ops re-run only once the resume point is reached
            return fn(s) if live else s

        def ms_key(k, from_lvl):
            # Key ciphertexts are added at the current level by reducing their
            # coefficients mod q_lvl (reference addRoundKey + coeffReduce,
            # Prince.cu:460-463 + 204-206).  q_lvl divides q_0, so in CRT form
            # this is simply dropping the cut prime planes.
            pn = self.ctx.params.num_crt_prime_lvl(self.level)
            return k[:, :pn]

        state = lin(state, lambda s: self.add_round_key(s, k0, 0))
        state = lin(state, lambda s: self.add_round_key(s, k1, 0))
        state = lin(state, lambda s: self.add_rc(s, rnd, 0))

        for i in range(5):
            rnd += 1
            state = sbox(state, inverse=False)
            if check is not None and live:
                check(rnd - 1, state, self.level)
            if max_rounds is not None and done >= max_rounds:
                return state
            lvl = self.level
            state = lin(state, lambda s: self.mix_column(s, lvl))
            state = lin(state, lambda s: self.add_rc(s, rnd, lvl))
            state = lin(state,
                        lambda s: self.add_round_key(s, ms_key(k1, 0), lvl))

        state = sbox(state, inverse=False)
        if check is not None and live:
            check(rnd, state, self.level)
        if max_rounds is not None and done >= max_rounds:
            return state

        state = lin(state, lambda s: self.m_p(s, self.level))
        state = sbox(state, inverse=True)
        if check is not None and live:
            check(rnd + 1, state, self.level)
        if max_rounds is not None and done >= max_rounds:
            return state

        for i in range(5):
            rnd += 1
            lvl = self.level
            state = lin(state,
                        lambda s: self.add_round_key(s, ms_key(k1, 0), lvl))
            state = lin(state, lambda s: self.add_rc(s, rnd, lvl))
            state = lin(state, lambda s: self.inv_mix_column(s, lvl))
            state = sbox(state, inverse=True)
            if check is not None and live:
                check(rnd + 1, state, self.level)
            if max_rounds is not None and done >= max_rounds:
                return state
        rnd += 1
        lvl = self.level
        state = self.add_rc(state, rnd, lvl)
        k1l = ms_key(k1, 0)
        state = self.add_round_key(state, k1l, lvl)
        k0l = self.key_expansion(ms_key(k0, 0), lvl)
        state = self.add_round_key(state, k0l, lvl)
        return state

    def run_known_answer(self, max_rounds: int | None = None):
        """Reference main(): A=0, B=1, C=0 (Prince.cu:68-96)."""
        A = [0] * 64
        B = [1] * 64
        C = [0] * 64
        return self.encrypt_blocks(A, B, C, max_rounds=max_rounds)
