classdef OGLBeamformerContrastMode < int32
	enumeration
		None (0)
		A1S2 (1)
	end
end