from .packing import pack_codes, unpack_codes, set_token_codes
