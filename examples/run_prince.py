"""Homomorphic PRINCE demo (TPU port of examples/Prince/test_Prince.cu).

Runs the known-answer evaluation: message A = all zeros, key0 = all ones,
key1 = all zeros; the decrypted 64-bit ciphertext must equal the published
trace (Prince.cu:96).  Pass --rounds N to evaluate only the first N S-box
layers (checked against the per-round vectors) for a quicker smoke run.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# drivers opt in to the (default-off) library timing knobs
os.environ.setdefault("CUHE_PRINCE_TIMING", "1")
os.environ.setdefault("CUHE_SETUP_TIMING", "1")

import jax

if jax.default_backend() == "tpu":
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from cuhe_tpu.models.prince import Prince
from cuhe_tpu.utils.timer import OTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=None,
                    help="stop after N S-box layers (default: full 12)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--check-rounds", action="store_true",
                    help="decrypt and print the state after every S-box layer")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="save the state after every S-box layer to DIR")
    ap.add_argument("--resume", default=None,
                    help="resume from a layer checkpoint .npz (see "
                         "--checkpoint-dir); fast-forwards the circuit")
    args = ap.parse_args()

    print("---------- Precomputation ----------")
    t = OTimer(); t.start()
    p = Prince(seed=args.seed)
    t.stop(); t.show("heSetup")

    seen = {}

    def check(rd, state, lvl):
        if not (args.check_rounds or rd in Prince.EXPECTED_ROUNDS):
            print(f"Round {rd} done (level {lvl})", flush=True)
            return
        bits = p.decrypt_state(state, lvl)
        s = "".join(str(b) for b in bits)
        seen[rd] = s
        exp = Prince.EXPECTED_ROUNDS.get(rd)
        print(f"Round {rd}: {s}", flush=True)
        if exp is not None:
            print("   expected:", exp, "OK" if s == exp else "MISMATCH",
                  flush=True)

    on_layer = None
    if args.checkpoint_dir:
        from cuhe_tpu.utils import checkpoint as ckpt
        os.makedirs(args.checkpoint_dir, exist_ok=True)

        def on_layer(done, state, lvl):
            path = os.path.join(args.checkpoint_dir, f"layer{done:02d}.npz")
            ckpt.save_state(path, state, lvl, done=done)
            print(f"checkpointed layer {done} (level {lvl}) -> {path}",
                  flush=True)

    resume = None
    if args.resume:
        import numpy as np
        from cuhe_tpu.utils import checkpoint as ckpt
        state0, lvl0 = ckpt.load_state(args.resume)
        done0 = int(np.load(args.resume)["done"])
        resume = (state0, lvl0, done0)
        print(f"resuming after S-box layer {done0} (level {lvl0})",
              flush=True)

    print("---------- PRINCE ENC ----------")
    t = OTimer(); t.start()
    state = p.encrypt_blocks([0] * 64, [1] * 64, [0] * 64,
                             max_rounds=args.rounds, check=check,
                             resume=resume, on_layer=on_layer)
    t.stop(); t.show("Prince Encryption")

    if args.rounds is None:
        print("---------- PRINCE DEC ----------")
        bits = p.decrypt_state(state, p.level)
        s = "".join(str(b) for b in bits)
        print(s)
        print(Prince.EXPECTED_FINAL)
        print("FINAL:", "OK" if s == Prince.EXPECTED_FINAL else "MISMATCH")


if __name__ == "__main__":
    main()
