from . import checksum, logging
