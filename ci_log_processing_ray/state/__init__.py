from .manifest import (  # noqa: F401
    ManifestStore,
    pending_inputs,
)
