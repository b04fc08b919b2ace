"""Contract-violation errors, mirroring the reference's public exception API
(``/root/reference/src/bio2bel/exc.py`` and the class-level checks in
``/root/reference/src/bio2bel/manager/connection_manager.py:70-77``).
"""

from __future__ import annotations


class Bio2BELSparkError(Exception):
    """Base class for engine errors."""


class Bio2BELMissingNameError(Bio2BELSparkError, TypeError):
    """Raised when a Dataset subclass omits ``module_name``."""


class Bio2BELModuleCaseError(Bio2BELSparkError, TypeError):
    """Raised when ``module_name`` is not lowercase."""


class Bio2BELMissingModelsError(Bio2BELSparkError, TypeError):
    """Raised when a Dataset subclass declares no table schemas."""


class Bio2BELTestMissingManagerError(Bio2BELSparkError, TypeError):
    """Raised by the testing harness when no Dataset class is configured."""


class Bio2BELMissingInputError(Bio2BELSparkError, ValueError):
    """Raised when a SourceDataset populate lacks a required input."""
