"""Tearfree: the modular second-order optimizer stack.

``tearfree()`` chains grafting ∘ (merge → blocked Shampoo | Sketchy →
unmerge) ∘ momentum ∘ lr, with a single shared momentum buffer.
Capability parity with `/root/reference/precondition/tearfree/`.
"""

from precondition_tpu.tearfree.optimizer import tearfree, TearfreeOptions
