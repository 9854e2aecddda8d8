"""Checkpoint inspection (reference ``tools/state_dict.py`` equivalent).

Dumps the parameter tree of an orbax checkpoint (or a torch CLIP ``.pt``)
with shapes/dtypes, and optionally diffs the key sets of two checkpoints —
the reference's debugging workflow of comparing trained vs CLIP key sets.

Usage:
    python tools/inspect_checkpoint.py <ckpt_dir_or_pt> [--diff other] [-o out.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_tree(path: str):
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        try:
            model = torch.jit.load(path, map_location="cpu")
            sd = model.state_dict()
        except RuntimeError:
            sd = torch.load(path, map_location="cpu")
        return {k: tuple(v.shape) for k, v in sd.items()}
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))

    out = {}

    def walk(tree, prefix):
        if hasattr(tree, "shape"):
            out[prefix] = tuple(tree.shape)
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}.{k}" if prefix else str(k))

    walk(restored, "")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--diff", default=None, help="second checkpoint to key-diff")
    parser.add_argument("-o", "--output", default=None)
    args = parser.parse_args()

    tree = load_tree(args.checkpoint)
    lines = [f"{k}  {v}" for k, v in sorted(tree.items())]
    import numpy as _np

    param_keys = [k for k in tree if k == "params" or k.startswith("params.")]
    if param_keys:
        n_params = sum(int(_np.prod(tree[k])) for k in param_keys)
        n_other = sum(int(_np.prod(v)) for v in tree.values()) - n_params
        lines.append(
            f"\n# {len(tree)} tensors; {n_params:,} model parameters"
            f" (+{n_other:,} optimizer/stat values)"
        )
    else:
        n_params = sum(int(_np.prod(v)) for v in tree.values())
        lines.append(f"\n# {len(tree)} tensors, {n_params:,} parameters")

    if args.diff:
        other = load_tree(args.diff)
        only_a = sorted(set(tree) - set(other))
        only_b = sorted(set(other) - set(tree))
        lines.append(f"\n# only in {args.checkpoint}: {len(only_a)}")
        lines.extend(f"  - {k}" for k in only_a)
        lines.append(f"# only in {args.diff}: {len(only_b)}")
        lines.extend(f"  + {k}" for k in only_b)

    text = "\n".join(lines)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text + "\n")
        print(f"wrote {args.output}")
    else:
        print(text)


if __name__ == "__main__":
    main()
