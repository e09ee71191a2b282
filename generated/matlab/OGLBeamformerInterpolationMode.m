classdef OGLBeamformerInterpolationMode < int32
	enumeration
		Nearest (0)
		Linear (1)
		Cubic (2)
	end
end