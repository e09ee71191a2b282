classdef OGLBeamformerViewPlaneTag < int32
	enumeration
		XZ (0)
		YZ (1)
		XY (2)
		Arbitrary (3)
	end
end