"""Golden tests for parameter derivations on the two shipped configs.

Oracle values are re-derived with Python big-int math following the formulas
cited in cuhe/Parameters.cu and cuhe/Operations.cu; structural invariants
mirror what the reference relies on implicitly.
"""

import math

from cuhe_tpu import hostmath as hm
from cuhe_tpu.params import P, make_params

SIMPLE = (5, 2, 1, 61, 20, 8191)    # examples/DHS/simple_DHS.cu:218
PRINCE = (25, 2, 16, 25, 25, 21845)  # examples/Prince/Prince.cu:47


def test_simple_dhs_config():
    pr = make_params(*SIMPLE)
    assert pr.mod_len == 8190
    assert pr.mod_len2 == 8192
    assert pr.ntt_len == 16384
    assert pr.log_coeff_max == 61 + 20 * 4 == 141
    # log_crt_prime: NumBits(isqrt(P / 8190)) then shrunk to minimal covering
    nb = math.isqrt(P // 8190).bit_length()
    num0 = (61 + nb - 1) // nb
    logc = 0
    while logc * num0 < 61:
        logc += 1
    assert pr.log_crt_prime == logc
    assert pr.num_crt_prime == num0 + 4
    assert pr.num_eval_key == 141  # w=1
    # per-level accessors
    assert pr.log_coeff(0) == 141
    assert pr.log_coeff(4) == 61
    assert pr.log_coeff(-1) == pr.log_msg == 1
    assert pr.num_crt_prime_lvl(0) == pr.num_crt_prime
    assert pr.num_crt_prime_lvl(-1) == 1
    assert pr.get_level(141) == 0
    assert pr.get_level(61) == 4
    assert pr.get_level(1) == -1
    assert pr.words_coeff(0) == (141 + 31) // 32


def test_prime_chain_simple():
    pr = make_params(*SIMPLE)
    ps = pr.crt_primes
    assert len(ps) == pr.num_crt_prime
    assert all(hm.is_prime(p) for p in ps)
    # large + mid primes descend from 2^log_crt - 1
    assert ps[0] == hm.prev_prime((1 << pr.log_crt_prime) - 1)
    # cutting primes: prime and == 1 mod mod_msg, of log_coeff_cut bits
    for p in ps[pr.num_crt_prime - pr.depth + 1:]:
        assert p % pr.mod_msg == 1
        assert p.bit_length() <= pr.log_coeff_cut
    # modulus ladder sizes
    for lvl in range(pr.depth):
        q = pr.coeff_modulus(lvl)
        assert q.bit_length() >= pr.log_coeff(lvl) - pr.log_coeff_cut
    # exact-convolution bound n * p^2 < P
    n = pr.ntt_len // 2
    assert all(n * p * p < P for p in ps)


def test_prime_chain_prince():
    pr = make_params(*PRINCE)
    assert pr.mod_len == 16384
    assert pr.ntt_len == 32768
    assert pr.num_crt_prime == pr.depth - 1 + (25 + pr.log_crt_prime - 1) // pr.log_crt_prime
    ps = pr.crt_primes
    assert all(hm.is_prime(p) for p in ps)
    for p in ps[pr.num_crt_prime - pr.depth + 1:]:
        assert p % 2 == 1
    n = pr.ntt_len // 2
    assert all(n * p * p < P for p in ps)


def test_icrt_consts_roundtrip():
    pr = make_params(*SIMPLE)
    for lvl in (0, 2, 4):
        q, mi, bi = pr.icrt_consts(lvl)
        pnum = pr.num_crt_prime_lvl(lvl)
        x = 0x1234567890ABCDEF % q
        res = [x % p for p in pr.crt_primes[:pnum]]
        back = sum((r * b % p) * m for r, b, m, p in
                   zip(res, bi, mi, pr.crt_primes[:pnum])) % q
        assert back == x


def test_poly_mod():
    pr = make_params(*SIMPLE)
    pm = pr.poly_mod
    # m = 8191 prime: m(x) = 1 + x + ... + x^8190
    assert len(pm) == 8191
    assert all(c == 1 for c in pm)

    pr2 = make_params(*PRINCE)
    pm2 = pr2.poly_mod
    assert len(pm2) == 16385  # degree phi(21845) = 16384
    assert pm2[-1] == 1
    # m(x) divides x^m - 1: exact long division mod a large prime
    p = (1 << 61) - 1
    import numpy as np
    mm = np.array(pm2, dtype=object)
    r = np.zeros(21846, dtype=object)
    r[21845] = 1
    r[0] = -1
    dm = len(mm) - 1  # 16384, mm monic
    for i in range(21845, dm - 1, -1):
        c = r[i] % p
        if c:
            r[i - dm: i + 1] = (r[i - dm: i + 1] - c * mm) % p
    assert not any(int(x) % p for x in r[:dm])
