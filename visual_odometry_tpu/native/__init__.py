"""Native (C++) host-side components: the mmap dataset parser."""
