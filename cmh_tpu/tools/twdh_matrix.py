"""Offline TwDH transform-matrix generation (JAX).

Re-implementation of /root/reference/runners/TwDH/transform_matrix_generation/
{model.py,train.py}: learn a (2·long, 2·short) matrix mapping one-hot long
hash-center pair targets to one-hot short-center pair targets with
BCE + soft-argmax sharpening + L1 lasso, trained with BertAdam; ``check``
verifies the matrix reconstructs the short centers losslessly (argmax over
pairs equals the short code sign pattern) and gates early stopping
(train.py:87-96,164-172).

Unlike the reference this needs no image/caption data — the loss depends
only on labels and centers (train.py:149-156 ignores image/text), so the
tool synthesizes label batches directly from the label matrix (or samples
class subsets when only centers are given).

CLI:
    python -m cmh_tpu.tools.twdh_matrix --long-dim 512 --output-dim 16 \
        --long-center-path .../512.pkl --short-center-path .../16.pkl \
        --save-dir out/
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hash_centers import (
    bce_probs,
    generate_hash_centers,
    hash_center_multilabels,
    hash_convert,
    load_center_file,
)
from ..optim.bert_adam import bert_adam


def soft_argmax_hash_loss_pairs(code: jax.Array) -> jax.Array:
    """1 - mean((p0 - p1)^2) over pair probabilities — the tool's sharper
    variant (train.py:87-92; the main model uses (2c-1)^2)."""
    code = code.reshape(code.shape[0], -1, 2)
    return 1.0 - jnp.mean((code[:, :, 0] - code[:, :, 1]) ** 2)


def matrix_forward(matrix: jax.Array, x: jax.Array) -> jax.Array:
    out = (x @ matrix).reshape(x.shape[0], -1, 2)
    out = jax.nn.softmax(out, axis=-1)
    return out.reshape(out.shape[0], -1)


def check(long_center: np.ndarray, short_center: np.ndarray,
          matrix: np.ndarray) -> bool:
    """Lossless reconstruction test (reference check(), train.py:94-103)."""
    low = (np.asarray(short_center) > 0).astype(np.int32)
    long_pairs = np.asarray(hash_convert(jnp.asarray(long_center)))
    rec = (long_pairs @ matrix).reshape(low.shape[0], low.shape[1], 2)
    rec = np.argmax(rec, axis=-1).astype(np.int32)
    return bool(np.array_equal(rec, low))


def train_transform_matrix(
    long_center: np.ndarray,
    short_center: np.ndarray,
    labels: Optional[np.ndarray] = None,
    epochs: int = 100,
    steps_per_epoch: int = 50,
    batch_size: int = 200,
    lr: float = 0.001,
    warmup: float = 0.1,
    weight_decay: float = 0.2,
    alpha: float = 0.001,
    seed: int = 1814,
    logger=print,
):
    """Returns (matrix (2·long, 2·short), lossless: bool)."""
    long_dim = long_center.shape[1]
    short_dim = short_center.shape[1]
    n_class = long_center.shape[0]
    key = jax.random.PRNGKey(seed)
    key, mk = jax.random.split(key)
    matrix = jax.random.uniform(
        mk, (2 * long_dim, 2 * short_dim), jnp.float32, -1.0, 1.0
    )
    lc = jnp.asarray(long_center, jnp.float32)
    sc = jnp.asarray(short_center, jnp.float32)

    t_total = steps_per_epoch * epochs
    tx = bert_adam(lr=lr, warmup=warmup, t_total=t_total,
                   schedule="warmup_cosine", b1=0.9, b2=0.98, e=1e-6,
                   weight_decay=weight_decay, max_grad_norm=1.0)
    opt_state = tx.init(matrix)

    if labels is not None:
        labels = jnp.asarray(labels, jnp.float32)

    @jax.jit
    def step(matrix, opt_state, batch_labels, tie_key):
        def loss_fn(m):
            long_hash = hash_convert(
                hash_center_multilabels(batch_labels, lc, tie_key)
            )
            low_hash = hash_convert(
                hash_center_multilabels(batch_labels, sc, tie_key)
            )
            target = matrix_forward(m, long_hash)
            hash_loss = soft_argmax_hash_loss_pairs(target)
            class_loss = bce_probs(target, low_hash)
            lasso = alpha * jnp.sum(jnp.abs(m))
            return hash_loss + class_loss + lasso, (hash_loss, class_loss, lasso)

        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(matrix)
        updates, opt_state = tx.update(grads, opt_state, matrix)
        return matrix + updates, opt_state, loss, parts

    for epoch in range(epochs):
        for s in range(steps_per_epoch):
            key, bk, tk = jax.random.split(key, 3)
            if labels is not None:
                idx = jax.random.randint(bk, (batch_size,), 0, labels.shape[0])
                batch_labels = labels[idx]
            else:
                # synthesize multi-hot labels over the center classes
                batch_labels = (
                    jax.random.uniform(bk, (batch_size, n_class)) < 2.0 / n_class
                ).astype(jnp.float32)
                rows = jnp.arange(batch_size)
                prim = jax.random.randint(tk, (batch_size,), 0, n_class)
                batch_labels = batch_labels.at[rows, prim].set(1.0)
            matrix, opt_state, loss, parts = step(
                matrix, opt_state, batch_labels, tk
            )
        logger(f"epoch {epoch}: loss={float(loss):.4f} "
               f"(hash={float(parts[0]):.4f}, bce={float(parts[1]):.4f}, "
               f"lasso={float(parts[2]):.4f})")
        m_np = np.asarray(matrix)
        if check(long_center, short_center, m_np):
            logger("find a lossless transform matrix!")
            return m_np, True
    return np.asarray(matrix), False


def save_matrix_pkl(matrix: np.ndarray, path: str) -> None:
    """Torch-pickle the matrix so the reference TwDH loader can read it."""
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(torch.tensor(np.asarray(matrix), dtype=torch.float32), path)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--long-dim", type=int, default=512)
    parser.add_argument("--output-dim", type=int, default=16)
    parser.add_argument("--num-classes", type=int, default=80)
    parser.add_argument("--long-center-path", type=str, default="")
    parser.add_argument("--short-center-path", type=str, default="")
    parser.add_argument("--label-file", type=str, default="")
    parser.add_argument("--post-epochs", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=200)
    parser.add_argument("--post-lr", type=float, default=0.001)
    parser.add_argument("--weight-decay", type=float, default=0.2)
    parser.add_argument("--warmup-proportion", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=1814)
    parser.add_argument("--save-dir", type=str, default="./")
    args = parser.parse_args()

    if args.long_center_path and os.path.isfile(args.long_center_path):
        long_center = load_center_file(args.long_center_path)
    else:
        long_center = generate_hash_centers(args.num_classes, args.long_dim, 13)
    if args.short_center_path and os.path.isfile(args.short_center_path):
        short_center = load_center_file(args.short_center_path)
    else:
        short_center = generate_hash_centers(args.num_classes, args.output_dim, 14)

    labels = None
    if args.label_file and os.path.isfile(args.label_file):
        from ..data.builder import load_labels

        labels = load_labels(args.label_file)

    matrix, lossless = train_transform_matrix(
        long_center, short_center, labels=labels, epochs=args.post_epochs,
        batch_size=args.batch_size, lr=args.post_lr,
        warmup=args.warmup_proportion, weight_decay=args.weight_decay,
        seed=args.seed,
    )
    out = os.path.join(args.save_dir, str(args.long_dim),
                       f"{args.output_dim}.pkl")
    save_matrix_pkl(matrix, out)
    print(f"saved {'lossless ' if lossless else ''}matrix to {out}")


if __name__ == "__main__":
    main()
