"""Fused multiply-add (parity: reference ops/fma.py:15-59).

In JAX this is just `a * b + c` — XLA fuses it and autodiff handles the
un-broadcast of gradients, which is what the reference's custom autograd
Function existed to do.
"""


def fma(a, b, c):
    return a * b + c
