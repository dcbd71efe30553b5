from .mlp import (BaseNetDef, NeRFDef, get_model, init_params,
                  parse_skip_dsl, auto_skip)
