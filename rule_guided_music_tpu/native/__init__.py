"""Native (C++) host-side components, bound via ctypes.

Builds lazily with g++ on first use and caches the shared object next to the
source. Everything degrades gracefully to the pure-Python implementations
when a toolchain isn't available.
"""

from .codec import (
    augment_roll_native,
    extract_notes_native,
    is_available,
    rasterize_notes_native,
)
