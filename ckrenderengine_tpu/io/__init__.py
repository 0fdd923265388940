from .statechunk import CKStateChunk
from .serialize import LoadScene, SaveScene, load_object, save_object
