"""RNG shim: PCG64 seeded from os.urandom instead of randomgen RDRAND.

Same interface as the original module; RNGWrapper.randrange keeps the
original chunked arbitrary-precision logic.
"""
import os

import numpy as np

_core_privacy_prng = np.random.Generator(
    np.random.PCG64(int.from_bytes(os.urandom(32), "big"))
)


def prng():
    return _core_privacy_prng


class RNGWrapper:
    def __init__(self, rng):
        self._rng = rng
        self._MAX_INT = int(np.iinfo(np.int64).max)

    def randrange(self, stop: int) -> int:
        if stop <= self._MAX_INT:
            return int(self._rng.integers(low=0, high=stop, endpoint=False))
        bits = (stop - 1).bit_length()
        random_integer = 0
        while bits >= 63:
            bits -= 63
            random_integer <<= 63
            random_integer += int(
                self._rng.integers(low=0, high=self._MAX_INT, endpoint=True)
            )
        random_integer <<= bits
        random_integer += int(self._rng.integers(low=0, high=2**bits, endpoint=False))
        if random_integer >= stop:
            return self.randrange(stop)
        return random_integer
