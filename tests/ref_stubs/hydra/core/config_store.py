class ConfigStore:
    _instance = None

    @classmethod
    def instance(cls):
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def store(self, name=None, node=None, group=None, provider=None, package=None):
        pass
