"""Distributed CRF training: synchronous data-parallel SGD
(SURVEY.md §2.5 A5, §7.1 step 7 — "distributed epoch = gradient partials
+ driver reduce").

The reference trains single-threaded (and its ``-N`` parallelism is
documented as broken, /root/reference/README.md:87-88). Gold corpora are
usually small enough for the kernel trainer; this is the scale path when
they are not. It is one of the few places raw ``@ray.remote`` tasks are
justified over Dataset transforms (SURVEY.md build rules): training is an
iterative algorithm with a sequential update dependency, so each step is
a broadcast (weights via ``ray.put``) + parallel gradient map + driver
reduce (summed in fixed worker order -> deterministic for a given
(seed, n_workers)).

Per-minibatch math is identical to the kernel trainer
(``crf.batch_gradient`` / ``crf.apply_update``); with larger distributed
minibatches the trajectory differs from the reference defaults, which is
documented and gated by a tagging-quality test rather than weight
equality.
"""

from __future__ import annotations

import numpy as np
import ray

from ..core import crf


@ray.remote
def _grad_chunk(weights, enc_ref, chunk):
    """One worker's gradient partial over its chunk of the minibatch."""
    w_obs, w_trans, w_start = weights
    model, enc_x, enc_y = enc_ref
    model.w_obs, model.w_trans, model.w_start = w_obs, w_trans, w_start
    return crf.batch_gradient(model, enc_x, enc_y, chunk)


def train_distributed(sentences, labels, args: crf.SgdArgs | None = None,
                      *, n_workers: int = 8,
                      batch_size: int | None = None) -> crf.Crf:
    """Data-parallel SGD. ``batch_size`` defaults to
    ``args.batch_size * n_workers`` so each worker gets a reference-sized
    share per step."""
    args = args or crf.SgdArgs()
    if batch_size is None:
        batch_size = args.batch_size * n_workers
    model, enc_x, enc_y = crf.encode_training(sentences, labels)
    n_sents = len(sentences)
    # encoded corpus + masks broadcast once; weights re-broadcast per step
    enc_ref = ray.put((model, enc_x, enc_y))

    rng = np.random.default_rng(args.seed)
    for it in range(args.iter_num):
        gain = args.gain0 * args.tau / (args.tau + it)
        perm = rng.permutation(n_sents)
        for lo in range(0, n_sents, batch_size):
            batch = perm[lo:lo + batch_size]
            weights_ref = ray.put((model.w_obs, model.w_trans,
                                   model.w_start))
            chunks = [c for c in np.array_split(batch, n_workers)
                      if len(c)]
            futs = [_grad_chunk.remote(weights_ref, enc_ref, c)
                    for c in chunks]
            g_obs = np.zeros_like(model.w_obs)
            g_trans = np.zeros_like(model.w_trans)
            g_start = np.zeros_like(model.w_start)
            for f in futs:  # fixed order reduce -> deterministic
                go, gt, gs = ray.get(f)
                g_obs += go
                g_trans += gt
                g_start += gs
            crf.apply_update(model, (g_obs, g_trans, g_start), gain,
                             len(batch), n_sents, args.reg_var)
    return model
