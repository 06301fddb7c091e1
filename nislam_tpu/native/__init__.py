"""Native (C++) runtime components: packed-dataset loader."""
