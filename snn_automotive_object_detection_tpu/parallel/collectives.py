"""Cross-process object gathering for host-side data (eval merge).

Replaces the reference's pickled ``all_gather`` of evaluation results
(/root/reference/utils.py:78-91, coco_eval.py:158-177). Arbitrary picklable
objects are serialised to uint8 arrays and exchanged through a padded
``process_allgather`` — single-process calls short-circuit.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np
import jax


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object from every JAX process.

    Returns the list of all processes' objects (index == process_index).
    """
    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    length = np.asarray([payload.size], np.int64)
    lengths = multihost_utils.process_allgather(length)  # [P, 1]
    max_len = int(np.max(lengths))
    padded = np.zeros(max_len, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)  # [P, max_len]
    out = []
    for p in range(jax.process_count()):
        n = int(np.asarray(lengths)[p].reshape(-1)[0])
        out.append(pickle.loads(np.asarray(gathered)[p, :n].tobytes()))
    return out
