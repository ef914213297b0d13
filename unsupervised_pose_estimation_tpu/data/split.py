"""Split-file parsing.

Split files are text lines "folder [frame_id] [side]" as in the reference's
`splits/**` (consumed via `readlines`, `/root/reference/utils.py:25-30`, and
parsed per dataset, e.g. `/root/reference/datasets/lung_dataset.py:46-60`).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


def readlines(filename: str) -> List[str]:
    with open(filename, "r") as f:
        return f.read().splitlines()


def parse_split_line(line: str) -> Tuple[str, int, Optional[str]]:
    """-> (folder, frame_index, side); missing fields default to (0, None)."""
    parts = line.split()
    folder = parts[0]
    frame_index = int(parts[1]) if len(parts) >= 2 else 0
    side = parts[2] if len(parts) >= 3 else None
    return folder, frame_index, side
