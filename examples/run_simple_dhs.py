"""End-to-end correctness demo: the TPU port of examples/DHS/simple_DHS.cu.

Checks homomorphic XOR (no relin/modswitch), NOT, AND (+relin +modSwitch at
decrypt level 1) and key export/import round trips, on the shipped parameter
set CuDHS(5, 2, 1, 61, 20, 8191).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from cuhe_tpu import poly
from cuhe_tpu.dhs import CuDHS
from cuhe_tpu.utils.timer import OTimer

P_MSG = 2


def main():
    rng = np.random.default_rng(int(time.time()))
    print("---------- Precomputation ----------")
    t = OTimer(); t.start()
    dhs = CuDHS(5, P_MSG, 1, 61, 20, 8191, seed=int(time.time()))
    t.stop(); t.show("keygen")

    def rand_bits():
        return [int(b) for b in rng.integers(0, P_MSG, dhs.num_slot)]

    # XOR (no relin / modswitch)
    x = [rand_bits(), rand_bits()]
    y = [dhs.encrypt(dhs.batcher.encode(xi), 0) for xi in x]
    cts = [poly.to_ntt(dhs.ctx, poly.ctxt_from_ints(yi, 0)) for yi in y]
    z = dhs.batcher.decode(dhs.decrypt(
        poly.to_ints(dhs.ctx, poly.c_xor(dhs.ctx, cts[0], cts[1])), 0))
    ok = z == [(a + b) % P_MSG for a, b in zip(x[0], x[1])]
    print("xor\t" + ("right" if ok else "wrong"))

    # NOT
    x0 = rand_bits()
    ct = poly.to_crt(dhs.ctx, poly.ctxt_from_ints(
        dhs.encrypt(dhs.batcher.encode(x0), 0), 0))
    z = dhs.batcher.decode(dhs.decrypt(
        poly.to_ints(dhs.ctx, poly.c_not(dhs.ctx, ct)), 0))
    print("not\t" + ("right" if z == [1 - b for b in x0] else "wrong"))

    # AND + relin + modSwitch
    x = [rand_bits(), rand_bits()]
    y = [dhs.encrypt(dhs.batcher.encode(xi), 0) for xi in x]
    cts = [poly.to_ntt(dhs.ctx, poly.ctxt_from_ints(yi, 0)) for yi in y]
    cz = poly.mod_switch(dhs.ctx, poly.relin(dhs.ctx, poly.c_and(dhs.ctx, cts[0], cts[1])))
    z = dhs.batcher.decode(dhs.decrypt(poly.to_ints(dhs.ctx, cz), 1))
    ok = z == [a * b for a, b in zip(x[0], x[1])]
    print("and\t" + ("right" if ok else "wrong"))

    # key round trip
    x0 = rand_bits()
    y = dhs.encrypt(dhs.batcher.encode(x0), 0)
    dhs2 = CuDHS(key_string=dhs.get_private_key())
    ok = dhs2.batcher.decode(dhs2.decrypt(y, 0)) == x0
    dhs3 = CuDHS(key_string=dhs.get_public_key())
    y3 = dhs3.encrypt(dhs3.batcher.encode(x0), 0)
    ok &= dhs.batcher.decode(dhs.decrypt(y3, 0)) == x0
    print("keys:\t" + ("right" if ok else "wrong"))


if __name__ == "__main__":
    main()
