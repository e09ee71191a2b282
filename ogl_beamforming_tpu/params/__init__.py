"""params subpackage."""
